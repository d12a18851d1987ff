package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Deduplication operators over `documents` — the core of a pretraining
  * data pipeline, designed so nothing is ever all-pairs:
  *
  *  - exact dedup: hash-groupBy on a content fingerprint (one shuffle of
  *    16-byte keys, not text);
  *  - near-dup: word-3-gram shingles → 16 MinHashes → 4 LSH bands →
  *    candidate pairs ONLY within equal band buckets → exact Jaccard
  *    verification on the candidates. At 100 TB the band-bucket join is
  *    the only pair-producing step and its fan-out is bounded by bucket
  *    size (near-identical docs), never n².
  *
  * MinHash uses ONE md5 per shingle (its first 60 bits become the base
  * hash H) and derives the [[numHashes]] signature values with a
  * universal-hash family h_i(H) = (a_i·H + b_i) mod (2^61−1) — exact
  * integer arithmetic on both engines (pure long ops with Mersenne
  * reduction on the Spark side, HUGEINT on the DuckDB side), so the whole
  * chain — shingle, signature, band key, candidate pair — stays
  * bit-reproducible in the oracle. The earlier md5-per-(hash,shingle)
  * formulation computed 16 digests per shingle; at 100 TB the signature
  * map stage is the dominant dedup cost and this cuts its hashing 16×.
  * SimHash (the numeric cousin) lives in [[SimHash]].
  */
object Dedup {

  val numHashes = 16
  val bandSize = 4 // → 4 bands; P(candidate) = 1-(1-j^4)^4, ~1 for j≥0.9

  /** 2^61 − 1 (Mersenne prime — the universal-hash modulus). */
  val M61 = 2305843009213693951L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic (a_i, b_i) < 2^60 for h_i(H) = (a_i·H + b_i) mod M61;
    * a_i forced odd (and hence nonzero). Single source of truth for the
    * Spark expressions AND the oracle SQL (embedded as literals).
    */
  val hashParams: IndexedSeq[(Long, Long)] = (0 until numHashes).map { i =>
    def h60(t: String) = java.lang.Long.parseLong(md5hex(t).take(15), 16)
    (h60(s"a$i") | 1L, h60(s"b$i"))
  }

  /** (a·H + b) mod M61 in pure long arithmetic — codegen'd, no 128-bit
    * type, no BigDecimal, ANSI-overflow-safe for H < 2^60, a,b < 2^60:
    * split both factors at 2^31 and reduce with 2^61 ≡ 1 (mod M61), so
    * 2^62 ≡ 2. Every intermediate is < 2^63 (bounds in comments;
    * equivalence to BigInteger proven in OpsSpec).
    */
  def modAffineM61(H: Column, a: Long, b: Long): Column = {
    val mask = (1L << 31) - 1
    val h1 = shiftright(H, 31) // < 2^29
    val h0 = H.bitwiseAND(mask) // < 2^31
    val a1 = a >> 31 // < 2^29
    val a0 = a & mask // < 2^31
    val t1 = (h1 * a1 * 2L) % M61 // h1·a1 < 2^58, ×2 (≡ ·2^62) < 2^59
    val s = h1 * a0 + h0 * a1 // < 2^61
    val t2 = (shiftright(s, 31) * 2L + s.bitwiseAND(mask) * (mask + 1L)) % M61 // < 2^62+2^31
    val t3 = (h0 * a0) % M61 // < 2^62
    ((t1 + t2 + t3) % M61 + b) % M61 // 3·M61 < 2^63; +b < 2^62
  }

  /** The 60-bit shingle base hash: first 15 hex chars of md5. */
  def shingleH(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact duplicate groups: fingerprint → canonical (min) doc_id + count.
    * `dropDuplicates` semantics = keep rows where doc_id = canonical_id.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    TextMetrics.fingerprint(spark, dir)
      .groupBy("fingerprint")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Distinct word-3-gram shingles per document. Docs under 3 words yield
    * no shingles (guard needed: Spark's `sequence(0, n)` runs DESCENDING
    * for negative n instead of returning empty).
    */
  def shingles(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "dedup_shingles", dir, "dedup_shingles") {
      shinglesFrom(Tables.documents(spark, dir))
    }

  /** [[shingles]] over an arbitrary (doc_id, text, …) frame — the
    * streaming path shingles each arriving micro-batch with THIS.
    */
  def shinglesFrom(docsIn: DataFrame): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), split(TextMetrics.normalized(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    // word_ngrams is the custom Generator form of
    // explode(transform(sequence(...))) — one emitted row per window,
    // no per-document index/n-gram array materialization
    docs
      .select(col("doc_id"),
        graft.functions.WordNgramFunctions
          .wordNgrams(docsIn.sparkSession, col("ws"), 3).as("shingle"))
      .distinct()
  }

  /** Exact Jaccard verification of an arbitrary candidate pair set
    * against an arbitrary shingle table (streaming entry point —
    * batch-internal callers use [[nearDups]]).
    */
  def verifiedJaccardFrom(sh: DataFrame, pairs: DataFrame): DataFrame =
    verifiedJaccard(sh, pairs)

  /** Per-doc shingle counts (the deterministic stage check). */
  def shingleStats(spark: SparkSession, dir: String): DataFrame =
    shingles(spark, dir).groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"))

  /** Wide MinHash signature: one row per doc, columns mh_0..mh_15 where
    * mh_h = min over shingles of (a_h·H + b_h) mod M61. ONE shuffle of
    * the shingle set with 16 map-side-combining min aggregates — the
    * narrow (doc_id, h) formulation would explode 16× the rows and
    * shuffle all of them (measured 4× slower at sf0.1) — and ONE md5 per
    * shingle feeding all 16 affine transforms.
    */
  def minhashFrom(sh: DataFrame): DataFrame = {
    val withH = sh.withColumn("hh", shingleH(col("shingle")))
    withH.groupBy("doc_id").agg(
      min(modAffineM61(col("hh"), hashParams(0)._1, hashParams(0)._2)).as("mh_0"),
      (1 until numHashes).map(h =>
        min(modAffineM61(col("hh"), hashParams(h)._1, hashParams(h)._2)).as(s"mh_$h")): _*)
  }

  def minhash(spark: SparkSession, dir: String): DataFrame =
    minhashFrom(shingles(spark, dir))

  /** LSH band keys from the wide signature: band b's key = md5 of its
    * [[bandSize]] minhashes joined in h order. Pure projection — no
    * shuffle beyond the signature's own.
    */
  def bandsFrom(mh: DataFrame): DataFrame = {
    val nBands = numHashes / bandSize
    mh.select(col("doc_id"),
        explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band"),
            md5(concat_ws("|",
              (0 until bandSize).map(i =>
                col(s"mh_${b * bandSize + i}").cast("string")): _*))
              .as("band_key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  def bands(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "dedup_bands", dir, "dedup_bands")(bandsFrom(minhash(spark, dir)))

  /** Candidate near-dup pairs: docs sharing any band bucket. The band
    * frame is persisted by the caller (or here) — the self-join would
    * otherwise recompute the whole shingle→minhash chain for each side.
    */
  def candidatesFrom(bandsPersisted: DataFrame): DataFrame = {
    val a = bandsPersisted.select(col("band").as("band_a"), col("band_key").as("key_a"),
      col("doc_id").as("doc_a"))
    val c = bandsPersisted.select(col("band").as("band_b"), col("band_key").as("key_b"),
      col("doc_id").as("doc_b"))
    a.join(c, col("band_a") === col("band_b") && col("key_a") === col("key_b") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  def candidates(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "dedup_candidates", dir, "dedup_candidates")(candidatesFrom(bands(spark, dir)))

  /** Near-dup verification: exact n-gram Jaccard on the candidates only,
    * kept at >= `threshold` (default 0.5). Shingles are computed once and
    * persisted; every downstream stage (signatures, counts, intersection)
    * reuses them.
    */
  def nearDups(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame =
    verifiedJaccard(shingles(spark, dir), candidates(spark, dir))
      .filter(col("jaccard") >= threshold)

  /** Exact Jaccard over candidate pairs (doc_a, doc_b) — shared by
    * [[nearDups]] and [[incrementalNearDups]]. Restricts the shingle
    * table to candidate docs BEFORE the pair joins: the verify stage
    * then shuffles only the (tiny) candidate subset, not the full
    * corpus. The candidate id set is collision-driven — corpus-
    * proportional in the worst case — so it carries no hard hint: AQE
    * broadcasts it while it actually fits and falls back to a shuffled
    * semi join on a pathologically duplicate-heavy corpus.
    */
  private def verifiedJaccard(sh: DataFrame, pairs: DataFrame): DataFrame = {
    val docIds = pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val shCand = sh.join(Bcast.ifBounded(docIds, Bcast.Linear), Seq("doc_id"))
    val cnt = shCand.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(shCand.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(shCand.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (coalesce(col("i"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("i"), lit(0L))).cast("double"))
          .grid6.as("jaccard"))
  }

  /** Asymmetric CONTAINMENT scoring over the LSH candidate pairs —
    * `containment(A⊆B) = |A∩B| / |A|` — the measure resemblance misses:
    * a short document quoted wholesale inside a long one scores low
    * Jaccard (the union is large) but containment ≈ 1, which is exactly
    * the boilerplate-wrapping / quotation case a curation pipeline must
    * catch (Broder's distinction, SEQUENCES'97; public technique). Both
    * directions are reported with the exact set sizes; pairs are kept
    * when EITHER direction crosses `threshold`.
    *
    * Honest recall caveat: candidates still come from resemblance-LSH
    * bands, which under-surface extreme-containment/low-resemblance
    * pairs (small A inside huge B agrees on few minhashes). A dedicated
    * containment index would bucket on A's shingles alone; on this
    * fixture's prefix-copy structure the band index does surface the
    * contained pairs, and the verification itself is exact.
    */
  def containment(spark: SparkSession, dir: String,
                  threshold: Double = 0.5): DataFrame = {
    val pairs = candidates(spark, dir)
    val docIds = pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val shCand = shingles(spark, dir).join(Bcast.ifBounded(docIds, Bcast.Linear), Seq("doc_id"))
    val cnt = shCand.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(shCand.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(shCand.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    val ni = coalesce(col("i"), lit(0L))
    pairs.join(inter, Seq("doc_a", "doc_b"), "left")
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        ni.as("n_inter"),
        (ni.cast("double") / col("na").cast("double"))
          .grid6.as("a_in_b"),
        (ni.cast("double") / col("nb").cast("double"))
          .grid6.as("b_in_a"))
      .filter(greatest(col("a_in_b"), col("b_in_a")) >= threshold)
  }

  /** Incoming-batch incremental near-dedup — the production ingestion
    * path: a new batch is checked against the EXISTING corpus's LSH band
    * index without producing any corpus↔corpus pair. The incoming slice
    * is simulated as `doc_id % incomingMod == incomingRem` (swap in a
    * real batch source by replacing the two filters); the corpus side
    * reads the memoized band index ([[bands]] — at 100 TB a persisted
    * table maintained by ingestion, not recomputed). Cost is
    * O(incoming · bucket occupancy): the band join probes corpus buckets
    * only for the incoming batch's keys, then exact Jaccard verifies the
    * candidate sliver. Batch-internal duplicates are out of scope here —
    * that is ordinary [[nearDups]] applied to the batch alone.
    */
  def incrementalNearDups(spark: SparkSession, dir: String,
                          threshold: Double = 0.5): DataFrame = {
    val bd = bands(spark, dir)
    val inc = bd.filter(col("doc_id") % incomingMod === incomingRem)
      .select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
    val corp = bd.filter(col("doc_id") % incomingMod =!= incomingRem)
      .select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
    val pairs = inc.join(corp, Seq("band", "band_key"))
      .select("doc_a", "doc_b").distinct()
    verifiedJaccard(shingles(spark, dir), pairs)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a").as("new_doc"), col("doc_b").as("corpus_doc"),
        col("jaccard"))
  }

  /** Deterministic incoming-batch membership for the incremental demo. */
  val incomingMod = 11
  val incomingRem = 3

  /** Train/val/test leakage audit: near-dup pairs bucketed by the split
    * assignment of each endpoint — the QA gate that catches evaluation
    * contamination BEFORE training (a test doc whose near-duplicate sits
    * in train inflates eval scores exactly like benchmark contamination).
    * Output is the full split×split pair matrix: off-diagonal cells are
    * leaks; diagonal cells are ordinary within-split redundancy. Costs
    * two broadcast-sized joins on top of the (already candidate-bounded)
    * near-dup pair list — the split assignment is a pure hash column, so
    * at 100 TB the join inputs are (tiny pair list) × (corpus keyed by
    * doc_id), each a hash join on the pair list's own key.
    */
  def splitLeakage(spark: SparkSession, dir: String,
                   threshold: Double = 0.5): DataFrame = {
    val splits = Sampling.split(spark, dir)
    nearDups(spark, dir, threshold)
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"), min("doc_a").as("example_doc_a"))
  }

  def splitLeakageSql(threshold: Double = 0.5): String =
    s"""WITH nd AS (
       |${nearDupsSql(threshold)}
       |), s AS (
       |${Sampling.splitSql()}
       |)
       |SELECT sa.split AS split_a, sb.split AS split_b,
       |       COUNT(*) AS n_pairs, MIN(nd.doc_a) AS example_doc_a
       |FROM nd
       |JOIN s sa ON sa.doc_id = nd.doc_a
       |JOIN s sb ON sb.doc_id = nd.doc_b
       |GROUP BY 1, 2""".stripMargin

  /** Canonical assignment — the step that makes near-dedup actionable:
    * connected components over the verified near-dup pair graph, each
    * component labeled by its minimum doc_id ("keep the lowest id, drop
    * the rest"). Computed by iterative min-label propagation over the
    * edge list: each round every node adopts the smallest label among
    * itself and its neighbors; converges in O(graph diameter) rounds —
    * near-dup components are tiny cliques, so 2-3 rounds in practice,
    * each one join+aggregate over the (candidate-bounded) edge list,
    * never the corpus.
    */
  def canonical(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val edges = nearDups(spark, dir, threshold)
      .select(col("doc_a"), col("doc_b")).persist()
    try {
      val edgeCount = edges.count()
      // Hybrid: the verified near-dup graph is orders of magnitude smaller
      // than the corpus. Under ~1M edges (16 bytes each → ≤16 MB on the
      // driver), driver-side union-find beats the iterative join loop
      // (which pays several Spark jobs per round); the distributed
      // label-propagation path takes over beyond that.
      if (edgeCount * 16L <= 16L * 1024 * 1024) {
        import spark.implicits._
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          parent(x) = r
          r
        }
        edges.as[(Long, Long)].collect().foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keys.toSeq.sorted.map(d => (d, find(d)))
          .toDF("doc_id", "canonical_id")
      } else canonicalDistributed(spark, edges)
    } finally edges.unpersist()
  }

  /** Distributed min-label propagation for graphs too large to collect. */
  private def canonicalDistributed(spark: SparkSession, edges: DataFrame): DataFrame = {
    // undirected: propagate both ways
    val sym = edges.union(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .persist()
    // localCheckpoint per round: iterative joins otherwise grow the
    // logical plan linearly and Catalyst re-analyzes the whole history
    // every round — planning time, not data, dominated without it
    var labels = sym.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 20) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("lbl", "nlbl"), Seq("doc_b"))
        .groupBy(col("doc_a").as("doc_id"))
        .agg(min("nlbl").as("nmin"))
      val updated = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      converged = updated.join(labels.withColumnRenamed("lbl", "old"), "doc_id")
        .filter(col("lbl") =!= col("old")).isEmpty
      labels = updated
      rounds += 1
    }
    // the final labels are localCheckpoint-materialized, so the edge frame
    // is no longer needed by the returned plan
    sym.unpersist()
    labels.select(col("doc_id"), col("lbl").as("canonical_id"))
  }

  /** WITH RECURSIVE min-label closure — fixpoint semantics identical to
    * the iterative propagation.
    */
  def canonicalSql(threshold: Double = 0.5): String =
    s"""WITH RECURSIVE nd AS (
       |${nearDupsSql(threshold)}
       |), sym AS (
       |  SELECT doc_a, doc_b FROM nd
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM nd
       |), reach(doc_id, lbl) AS (
       |  SELECT doc_a, doc_a FROM sym
       |  UNION
       |  SELECT s.doc_a, r.lbl FROM sym s JOIN reach r ON r.doc_id = s.doc_b
       |)
       |SELECT doc_id, MIN(lbl) AS canonical_id
       |FROM reach GROUP BY doc_id""".stripMargin

  /** Quality-aware canonical selection — the survivor policy a real
    * dedup pass applies: within each near-dup cluster keep the HIGHEST
    * QUALITY document ([[TextMetrics.qualityScore]]), not the
    * smallest id. One row per cluster with its size and the keeper.
    *
    * The argmax is a single map-side-combined `max(struct(quality,
    * −doc_id))` over the cluster assignment joined to the per-doc
    * quality frame — no window sort, no per-cluster shuffle beyond the
    * cluster-keyed aggregate; deterministic because the quality doubles
    * are computed identically in both engines and ties break to the
    * smallest doc_id.
    */
  def keepBest(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame =
    canonical(spark, dir, threshold)
      .join(TextMetrics.quality(spark, dir)
        .select(col("doc_id"), col("quality_score")), "doc_id")
      .groupBy("canonical_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("quality_score").as("q"), (-col("doc_id")).as("nid"))).as("m"))
      .select(col("canonical_id"), col("n_members"),
        (-col("m.nid")).as("keep_doc"), col("m.q").as("keep_quality"))

  def keepBestSql(threshold: Double = 0.5): String =
    s"""WITH RECURSIVE cl AS (
       |${canonicalSql(threshold)}
       |), q AS (
       |${TextMetrics.qualitySql}
       |), ranked AS (
       |  SELECT cl.canonical_id, cl.doc_id, q.quality_score,
       |         ROW_NUMBER() OVER (PARTITION BY cl.canonical_id
       |                            ORDER BY q.quality_score DESC, cl.doc_id) AS rn,
       |         COUNT(*) OVER (PARTITION BY cl.canonical_id) AS n_members
       |  FROM cl JOIN q USING (doc_id)
       |)
       |SELECT canonical_id, CAST(n_members AS BIGINT) AS n_members,
       |       doc_id AS keep_doc, quality_score AS keep_quality
       |FROM ranked WHERE rn = 1""".stripMargin

  /** Per-source content drift between two corpus halves — the text
    * analogue of [[Drift.psi]]: the shingle-set Jaccard between a
    * source's even- and odd-id documents (standing in for two corpus
    * deliveries). A source whose deliveries cover the same material
    * scores high; a low score flags a distribution shift the downstream
    * mixture weights were not calibrated for. Rides the memoized
    * distinct-shingle table: one doc_id join to attach sources, one
    * (source, shingle)-keyed aggregate — O(corpus shingles), map-side
    * combined, never pairwise.
    */
  /** MinHash estimator calibration — the "measured, not asserted" QA for
    * the signature-size choice: per LSH candidate pair, the signature
    * estimate (matching components / [[numHashes]]) next to the EXACT
    * shingle Jaccard and the absolute error. The estimator is a
    * binomial mean over [[numHashes]] independent permutation
    * indicators, so its std-error is √(j(1−j)/numHashes) (≈ 0.125 at
    * j = 0.5 with 16 hashes) — the report is how an operator decides
    * whether to pay for a wider signature before trusting band
    * thresholds at corpus scale. `est_jaccard` = m/16 is EXACT in
    * doubles (power-of-two divisor), so the whole row is
    * engine-deterministic.
    *
    * Cost: the candidate-pair frame (graph-sized, never corpus-sized)
    * joined twice against the memoized signature, plus the same exact
    * verify the near-dup path already pays. No new corpus-scale work.
    */
  def minhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    val mh = minhash(spark, dir)
    val pairs = candidates(spark, dir)
    def side(tag: String) = mh.toDF(
      mh.columns.map(c => if (c == "doc_id") s"doc_$tag" else s"${c}_$tag"): _*)
    val matches = (0 until numHashes)
      .map(h => when(col(s"mh_${h}_a") === col(s"mh_${h}_b"), 1).otherwise(0))
      .reduce(_ + _)
    val est = pairs.join(side("a"), "doc_a").join(side("b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), matches.as("n_match"))
    val exact = verifiedJaccardFrom(shingles(spark, dir), pairs)
    est.join(exact, Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        (col("n_match").cast("double") / numHashes).as("est_jaccard"),
        col("jaccard").cast("double").as("jaccard"),
        abs(col("n_match").cast("double") / numHashes -
          col("jaccard").cast("double")).as("abs_err"))
  }

  def minhashCalibrationSql: String =
    s"""WITH $candidatesCte, sig_match AS (
       |  SELECT p.doc_a, p.doc_b,
       |         CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS INT) AS n_match
       |  FROM cand_pairs p
       |  JOIN doc_sig a ON a.doc_id = p.doc_a
       |  JOIN doc_sig b ON b.doc_id = p.doc_b AND b.h = a.h
       |  GROUP BY 1, 2
       |), sh_counts AS (
       |  SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY 1
       |), pair_inter AS (
       |  SELECT p.doc_a, p.doc_b, count(*) AS i
       |  FROM cand_pairs p
       |  JOIN doc_shingles a ON a.doc_id = p.doc_a
       |  JOIN doc_shingles b ON b.doc_id = p.doc_b AND a.shingle = b.shingle
       |  GROUP BY 1, 2
       |), ex AS (
       |  SELECT p.doc_a, p.doc_b,
       |         floor((CAST(COALESCE(i.i, 0) AS DOUBLE)
       |              / CAST(ca.n + cb.n - COALESCE(i.i, 0) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS jaccard
       |  FROM cand_pairs p
       |  LEFT JOIN pair_inter i ON p.doc_a = i.doc_a AND p.doc_b = i.doc_b
       |  JOIN sh_counts ca ON ca.doc_id = p.doc_a
       |  JOIN sh_counts cb ON cb.doc_id = p.doc_b
       |)
       |SELECT s.doc_a, s.doc_b, s.n_match,
       |       CAST(s.n_match AS DOUBLE) / $numHashes AS est_jaccard,
       |       CAST(ex.jaccard AS DOUBLE) AS jaccard,
       |       ABS(CAST(s.n_match AS DOUBLE) / $numHashes
       |           - CAST(ex.jaccard AS DOUBLE)) AS abs_err
       |FROM sig_match s JOIN ex ON s.doc_a = ex.doc_a AND s.doc_b = ex.doc_b""".stripMargin

  def shingleDrift(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val perHalf = shingles(spark, dir)
      .join(src, "doc_id")
      .select(col("source"), col("shingle"), pmod(col("doc_id"), lit(2)).as("half"))
      .distinct()
      .groupBy("source", "shingle")
      .agg(count(lit(1)).as("halves"))
    perHalf.groupBy("source")
      .agg(count(lit(1)).as("union_shingles"),
        sum(when(col("halves") === 2, 1L).otherwise(0L)).as("common_shingles"))
      .select(col("source"), col("union_shingles"), col("common_shingles"),
        (col("common_shingles").cast("double") / col("union_shingles"))
          .as("jaccard"))
  }

  // def, not val: shinglesCte is declared later in the object and a val
  // here would capture null at initialization order
  def shingleDriftSql: String =
    s"""WITH $shinglesCte, s AS (
       |  SELECT doc_id, source FROM documents
       |), t AS (
       |  SELECT DISTINCT s.source, d.shingle, d.doc_id % 2 AS half
       |  FROM doc_shingles d JOIN s USING (doc_id)
       |), a AS (
       |  SELECT source, shingle, COUNT(*) AS halves FROM t GROUP BY 1, 2
       |)
       |SELECT source,
       |       CAST(COUNT(*) AS BIGINT) AS union_shingles,
       |       CAST(SUM(CASE WHEN halves = 2 THEN 1 ELSE 0 END) AS BIGINT) AS common_shingles,
       |       CAST(SUM(CASE WHEN halves = 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS jaccard
       |FROM a GROUP BY 1""".stripMargin

  /** Near-dup cluster-size histogram — how concentrated the duplication
    * is: many size-2 clusters mean scattered copies (cheap to dedup);
    * a few giant clusters mean template/boilerplate families that
    * deserve their own rule. Two metadata-scale aggregates over the
    * canonical assignment (graph-sized, never corpus-sized).
    */
  def clusterSizes(spark: SparkSession, dir: String,
                   threshold: Double = 0.5): DataFrame =
    canonical(spark, dir, threshold)
      .groupBy("canonical_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))

  def clusterSizesSql(threshold: Double = 0.5): String =
    s"""WITH RECURSIVE cl AS (
       |${canonicalSql(threshold)}
       |), sizes AS (
       |  SELECT canonical_id, COUNT(*) AS cluster_size FROM cl GROUP BY 1
       |)
       |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       |       CAST(COUNT(*) AS BIGINT) AS n_clusters
       |FROM sizes GROUP BY 1""".stripMargin

  /** Cross-source near-duplication matrix — syndication/mirror
    * detection: how many verified near-dup pairs join documents of each
    * (unordered) source pair. A diagonal-heavy matrix means duplication
    * is internal boilerplate; heavy off-diagonal cells name the source
    * pairs republishing each other's content — which decides WHERE a
    * dedup pass should spend its budget. Rides the verified near-dup
    * graph (graph-sized, never corpus-sized); the two source lookups
    * shuffle only pair endpoints, with the (doc_id, source) side
    * reduced before the join.
    */
  def sourceOverlap(spark: SparkSession, dir: String,
                    threshold: Double = 0.5): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    nearDups(spark, dir, threshold)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
      .select(least(col("src_a"), col("src_b")).as("source_x"),
        greatest(col("src_a"), col("src_b")).as("source_y"),
        col("jaccard"))
      .groupBy("source_x", "source_y")
      .agg(count(lit(1)).as("n_pairs"), max("jaccard").as("max_jaccard"))
  }

  def sourceOverlapSql(threshold: Double = 0.5): String =
    s"""WITH nd AS (
       |${nearDupsSql(threshold)}
       |), s AS (
       |  SELECT doc_id, source FROM documents
       |)
       |SELECT LEAST(sa.source, sb.source) AS source_x,
       |       GREATEST(sa.source, sb.source) AS source_y,
       |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |       MAX(nd.jaccard) AS max_jaccard
       |FROM nd
       |JOIN s sa ON sa.doc_id = nd.doc_a
       |JOIN s sb ON sb.doc_id = nd.doc_b
       |GROUP BY 1, 2""".stripMargin

  /** Multi-signal near-dup scoring: the text-level candidates (banded
    * MinHash → Jaccard) joined with the embedding-level cosine of the
    * same pair (`vec_id` and `doc_id` share the id space in the
    * testdata). Agreement between independent signals is the standard
    * precision filter before destructive dedup at scale — both inputs
    * are candidate-bounded, so the join is pair-count sized.
    */
  def multiSignal(spark: SparkSession, dir: String,
                  threshold: Double = 0.5): DataFrame = {
    val pairs = nearDups(spark, dir, threshold)
    val e = Similarity.normalized(spark, dir)
      .select(col("vec_id"), col("v"), col("norm"))
    // LEFT joins: a pair without embedding coverage keeps its text signal
    // with a NULL cosine — an inner join would silently declare it
    // "not a duplicate" (embeddings cover fewer ids than documents)
    pairs
      .join(e.select(col("vec_id").as("doc_a"), col("v").as("va"), col("norm").as("na")),
        Seq("doc_a"), "left")
      .join(e.select(col("vec_id").as("doc_b"), col("v").as("vb"), col("norm").as("nb")),
        Seq("doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .grid6.as("cosine_sim"))
  }

  def multiSignalSql(threshold: Double = 0.5): String =
    s"""WITH nd AS (
       |${nearDupsSql(threshold)}
       |), emb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
       |  FROM embeddings
       |)
       |SELECT nd.doc_a, nd.doc_b, CAST(nd.jaccard AS DOUBLE) AS jaccard,
       |       CAST(floor((list_dot_product(a.v, b.v) / (a.norm * b.norm)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS cosine_sim
       |FROM nd LEFT JOIN emb a ON a.vec_id = nd.doc_a
       |LEFT JOIN emb b ON b.vec_id = nd.doc_b""".stripMargin

  // ---------- DuckDB oracles ----------

  /** Shared CTE: normalized distinct shingles per doc. */
  val shinglesCte: String =
    """doc_shingles AS (
      |  SELECT DISTINCT doc_id, ws[i.i] || ' ' || ws[i.i+1] || ' ' || ws[i.i+2] AS shingle
      |  FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
      |        FROM documents) w
      |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS i) i
      |)""".stripMargin

  val exactSql: String =
    """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
      |       min(doc_id) AS canonical_id, count(*) AS dup_count
      |FROM documents GROUP BY 1""".stripMargin

  val shingleStatsSql: String =
    s"WITH $shinglesCte SELECT doc_id, count(*) AS n_shingles FROM doc_shingles GROUP BY 1"

  private val hashParamsValues: String =
    hashParams.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  val bandsCte: String =
    s"""$shinglesCte, doc_h AS (
       |  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS hh
       |  FROM doc_shingles
       |), doc_sig AS (
       |  SELECT doc_id, CAST(t.h AS INT) AS h,
       |         CAST(min((CAST(t.a AS HUGEINT) * hh + t.b) % $M61) AS BIGINT) AS mh
       |  FROM doc_h, (VALUES $hashParamsValues) t(h, a, b)
       |  GROUP BY 1, 2
       |), doc_bands AS (
       |  SELECT doc_id, CAST(h // $bandSize AS INT) AS band,
       |         md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY h)) AS band_key
       |  FROM doc_sig GROUP BY doc_id, h // $bandSize
       |)""".stripMargin

  val bandsSql: String =
    s"WITH $bandsCte SELECT doc_id, band, band_key FROM doc_bands"

  val candidatesCte: String =
    s"""$bandsCte, cand_pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM doc_bands a JOIN doc_bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |)""".stripMargin

  val candidatesSql: String =
    s"WITH $candidatesCte SELECT doc_a, doc_b FROM cand_pairs"

  /** Registered-query form of [[nearDupsSql]]: the threshold filter stays
    * on the exact 1e-6 grid, only the output column becomes DOUBLE
    * (graft.Parity contract).
    */
  def nearDupsOutSql(threshold: Double): String =
    s"""WITH nd AS (
       |${nearDupsSql(threshold)}
       |) SELECT doc_a, doc_b, CAST(jaccard AS DOUBLE) AS jaccard FROM nd""".stripMargin

  /** Oracle for [[incrementalNearDups]]: the symmetric near-dup relation
    * restricted to pairs straddling the incoming/corpus boundary and
    * re-oriented (incoming side first). Band-bucket sharing is
    * symmetric, so this is exactly the incremental join's output.
    */
  def incrementalSql(threshold: Double = 0.5): String =
    s"""WITH nd AS (
       |${nearDupsSql(threshold)}
       |)
       |SELECT CASE WHEN doc_a % $incomingMod = $incomingRem THEN doc_a ELSE doc_b END AS new_doc,
       |       CASE WHEN doc_a % $incomingMod = $incomingRem THEN doc_b ELSE doc_a END AS corpus_doc,
       |       CAST(jaccard AS DOUBLE) AS jaccard
       |FROM nd
       |WHERE (doc_a % $incomingMod = $incomingRem) <> (doc_b % $incomingMod = $incomingRem)""".stripMargin

  def nearDupsSql(threshold: Double): String =
    s"""WITH $candidatesCte, sh_counts AS (
       |  SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY 1
       |), pair_inter AS (
       |  SELECT p.doc_a, p.doc_b, count(*) AS i
       |  FROM cand_pairs p
       |  JOIN doc_shingles a ON a.doc_id = p.doc_a
       |  JOIN doc_shingles b ON b.doc_id = p.doc_b AND a.shingle = b.shingle
       |  GROUP BY 1, 2
       |)
       |SELECT p.doc_a, p.doc_b,
       |       floor((CAST(COALESCE(i.i, 0) AS DOUBLE)
       |            / CAST(ca.n + cb.n - COALESCE(i.i, 0) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS jaccard
       |FROM cand_pairs p
       |LEFT JOIN pair_inter i ON p.doc_a = i.doc_a AND p.doc_b = i.doc_b
       |JOIN sh_counts ca ON ca.doc_id = p.doc_a
       |JOIN sh_counts cb ON cb.doc_id = p.doc_b
       |WHERE floor((CAST(COALESCE(i.i, 0) AS DOUBLE)
       |           / CAST(ca.n + cb.n - COALESCE(i.i, 0) AS DOUBLE)) * 1e6 + 0.5) / 1e6 >= $threshold""".stripMargin

  def containmentSql(threshold: Double = 0.5): String =
    s"""WITH $candidatesCte, sh_counts AS (
       |  SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY 1
       |), pair_inter AS (
       |  SELECT p.doc_a, p.doc_b, count(*) AS i
       |  FROM cand_pairs p
       |  JOIN doc_shingles a ON a.doc_id = p.doc_a
       |  JOIN doc_shingles b ON b.doc_id = p.doc_b AND a.shingle = b.shingle
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT p.doc_a, p.doc_b,
       |         CAST(ca.n AS BIGINT) AS na, CAST(cb.n AS BIGINT) AS nb,
       |         CAST(COALESCE(i.i, 0) AS BIGINT) AS n_inter,
       |         floor((CAST(COALESCE(i.i, 0) AS DOUBLE) / CAST(ca.n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS a_in_b,
       |         floor((CAST(COALESCE(i.i, 0) AS DOUBLE) / CAST(cb.n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS b_in_a
       |  FROM cand_pairs p
       |  LEFT JOIN pair_inter i ON p.doc_a = i.doc_a AND p.doc_b = i.doc_b
       |  JOIN sh_counts ca ON ca.doc_id = p.doc_a
       |  JOIN sh_counts cb ON cb.doc_id = p.doc_b
       |)
       |SELECT doc_a, doc_b, na, nb, n_inter,
       |       CAST(a_in_b AS DOUBLE) AS a_in_b, CAST(b_in_a AS DOUBLE) AS b_in_a
       |FROM scored WHERE GREATEST(a_in_b, b_in_a) >= $threshold""".stripMargin
}
