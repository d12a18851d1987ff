package graft.ops

import graft.Bcast

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) similarity search — the coarse-quantization scale
  * path complementing sign-LSH: assign every vector to its nearest
  * centroid (one broadcast join, no shuffle of the corpus), build the
  * centroid→vectors inverted lists, and answer top-k by scanning only the
  * query's `nprobe` nearest lists.
  *
  * Centroid construction is seeded with the first k corpus vectors
  * (k = [[AnnParams.nCentroids]] ≈ √(n/4)) and refined with ONE k-means
  * iteration: assign → per-list mean → reassign. The mean is computed in
  * integer arithmetic — per-dimension sum of `round(x·10⁶)` longs, then a
  * single division — so it is partition-order independent and
  * bit-identical across engines (a double sum's low bits depend on
  * summation order; an integer sum doesn't), keeping the whole chain
  * DuckDB-oracle-checkable. Refinement matters beyond list balance: it
  * pulls centroids toward density, which is what lifts probe recall
  * (measured in IvfSpec: max/mean list-size ratio drops vs the raw
  * seeds, and recall@10 rises).
  *
  * Both assignment passes are hierarchical — nearest COARSE centroid
  * (the √k lowest-id centroids) first, then the nearest fine centroid
  * within that coarse cell — cutting the one superlinear stage from
  * O(n·k) to O(n·√k) comparisons (measured in SCALE.md's 10×
  * experiment). Ties → lower id at both levels, so assignment stays
  * deterministic and the oracle mirrors it exactly.
  *
  * At 100 TB the plan shape is: centroids broadcast (√-law small), corpus
  * hash-partitioned by cluster once, a query touches
  * [[AnnParams.nProbe]] lists instead of all of them.
  */
object Ivf {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** First-k corpus vectors — the k-means seeds. */
  private def seeds(spark: SparkSession, dir: String,
                    c: Similarity.VecCorpus): DataFrame =
    c.normalizedOf(spark, dir)
      .filter(col("vec_id") <
        AnnParams.nCentroids(AnnParams.corpusSizeOf(spark, dir, c)))
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"),
        col("norm").as("cnorm"))

  /** (vec_id, centroid_id): hierarchical two-level nearest-centroid
    * assignment against an arbitrary centroid table — coarse cell first
    * (centroid_id < coarseN), then the nearest fine centroid within that
    * cell. Every coarse centroid is also a fine centroid and self-assigns
    * (cosine 1.0 with itself wins), so no cell is empty.
    */
  private def hierarchicalAssign(e: DataFrame, c: DataFrame,
                                 coarseN: Long): DataFrame = {
    val coarse = Bcast.ifBounded(c.filter(col("centroid_id") < coarseN)
      .select(col("centroid_id").as("coarse_id"),
        col("cv").as("gv"), col("cnorm").as("gnorm")), Bcast.SqrtLaw)

    def nearestCoarse(in: DataFrame, vCol: String, nCol: String, keep: Seq[String]) = {
      val cos = (dot(col(vCol), col("gv")) / (col(nCol) * col("gnorm")))
        .grid6
      in.crossJoin(coarse)
        .select(keep.map(col) :+ col("coarse_id") :+ cos.as("gcos"): _*)
        .withColumn("rk", row_number().over(
          Window.partitionBy(keep.head, keep.tail: _*)
            .orderBy(col("gcos").desc, col("coarse_id"))))
        .filter(col("rk") === 1)
        .select(keep.map(col) :+ col("coarse_id"): _*)
    }

    // fine centroid → its coarse cell (self-assigns when it IS coarse)
    val cellOf = Bcast.ifBounded(
      nearestCoarse(c, "cv", "cnorm", Seq("centroid_id", "cv", "cnorm")),
      Bcast.SqrtLaw)
    // vector → coarse cell → nearest fine centroid within the cell
    val vecCell = nearestCoarse(e, "v", "norm", Seq("vec_id", "v", "norm"))
    val cos = (dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .grid6
    vecCell.join(cellOf, "coarse_id")
      .select(col("vec_id"), col("centroid_id"), cos.as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("centroid_id"))))
      .filter(col("rk") === 1)
      .select("vec_id", "centroid_id")
  }

  private def coarseN(spark: SparkSession, dir: String,
                      c: Similarity.VecCorpus = Similarity.embCorpus): Long = {
    val nc = AnnParams.nCentroids(AnnParams.corpusSizeOf(spark, dir, c))
    math.max(1, math.floor(math.sqrt(nc.toDouble)).toLong)
  }

  /** Assignment against the raw seeds — the input to the refinement step
    * (and IvfSpec's balance baseline).
    */
  def seedAssignments(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "ivf_seed_assign", dir, "ivf_seed_assign") {
      hierarchicalAssign(Similarity.normalized(spark, dir),
        seeds(spark, dir, Similarity.embCorpus), coarseN(spark, dir))
    }

  /** Lloyd iterations applied to the seeds (see [[centroids]]). */
  val refineRounds = 2

  /** One Lloyd step: assign to `cent`, then per-list per-dimension mean
    * in order-independent integer arithmetic (Σ round(x·10⁶) as long,
    * ONE double division at the end). A centroid whose list came up
    * empty (only possible with duplicate vectors) simply drops out;
    * assignment stays total either way.
    */
  private def refineOnce(e: DataFrame, cent: DataFrame, cn: Long): DataFrame = {
    val means = hierarchicalAssign(e, cent, cn).join(e, "vec_id")
      .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("centroid_id", "pos")
      .agg((sum(round(col("x") * lit(1e6)).cast("long")).cast("double") /
        (count(lit(1)) * lit(1e6))).as("m"))
    means.groupBy("centroid_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
      .withColumn("cnorm", sqrt(dot(col("cv"), col("cv"))))
  }

  /** K-means-refined centroids: [[refineRounds]] Lloyd steps from the
    * seeds.
    */
  def centroids(spark: SparkSession, dir: String,
                corpus: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    centroidsAt(spark, dir, refineRounds, corpus)

  /** Centroids after an explicit round count (sweep/spec aid; rounds = 0
    * is the raw seeds).
    */
  def centroidsAt(spark: SparkSession, dir: String, rounds: Int,
                  corpus: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    graft.Memo(spark, corpus.memoName(s"ivf_centroids_$rounds"), dir,
      corpus.memoName("ivf_centroids")) {
      val e = corpus.normalizedOf(spark, dir)
      val cn = coarseN(spark, dir, corpus)
      (1 to rounds).foldLeft(seeds(spark, dir, corpus))((c, _) => refineOnce(e, c, cn))
    }

  /** (vec_id, centroid_id) against the REFINED centroids — the inverted
    * file every probe reads.
    */
  def assignments(spark: SparkSession, dir: String,
                  corpus: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    graft.Memo(spark, corpus.memoName("ivf_assignments"), dir,
      corpus.memoName("ivf_assignments")) {
      hierarchicalAssign(corpus.normalizedOf(spark, dir),
        centroids(spark, dir, corpus), coarseN(spark, dir, corpus))
    }

  /** Inverted-list sizes — the probe-cost profile. */
  def listStats(spark: SparkSession, dir: String): DataFrame =
    assignments(spark, dir).groupBy("centroid_id")
      .agg(count(lit(1)).as("n_vectors"))

  /** Hierarchical assignment of the whole corpus to an arbitrary
    * centroid table (sweep/spec aid).
    */
  private[graft] def assignTo(spark: SparkSession, dir: String,
                              cent: DataFrame): DataFrame =
    hierarchicalAssign(Similarity.normalized(spark, dir), cent,
      coarseN(spark, dir))

  /** Top-k over the query's nprobe nearest inverted lists; nprobe scales
    * with the corpus ([[AnnParams.nProbe]]) unless overridden.
    */
  def topK(spark: SparkSession, dir: String, k: Int = 10,
           queryMod: Int = 50, nProbeOverride: Int = 0,
           corpus: Similarity.VecCorpus = Similarity.embCorpus): DataFrame = {
    val nProbe =
      if (nProbeOverride > 0) nProbeOverride
      else AnnParams.nProbe(AnnParams.corpusSizeOf(spark, dir, corpus))
    // memoized per parameterization (see Similarity.bruteForceTopK)
    graft.Memo(spark, corpus.memoName(s"ivf_topk_${k}_${queryMod}_$nProbe"),
      dir, corpus.memoName("ivf_topk")) {
      topKWith(spark, dir, centroids(spark, dir, corpus),
        assignments(spark, dir, corpus), nProbe, k, queryMod, corpus)
    }
  }

  /** Per-query nProbe nearest centroids: (query_id, qv, qn, centroid_id)
    * — the probe stage shared by [[topKWith]] and the IVF-PQ composition
    * ([[Pq.ivfPqTopK]]).
    */
  private[ops] def probesOf(spark: SparkSession, dir: String,
                            cent: DataFrame, nProbe: Int, queryMod: Int,
                            corpus: Similarity.VecCorpus = Similarity.embCorpus): DataFrame = {
    val c = Bcast.ifBounded(cent, Bcast.SqrtLaw)
    val q = corpus.normalizedOf(spark, dir)
      .filter(AnnParams.queryPred(queryMod))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val qcos = (dot(col("qv"), col("cv")) / (col("qn") * col("cnorm")))
      .grid6
    q.crossJoin(c)
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id"), qcos.as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("centroid_id"))))
      .filter(col("rk") <= nProbe)
      .select("query_id", "qv", "qn", "centroid_id")
  }

  /** [[topK]] against explicit centroids + assignment (sweep/spec aid). */
  private[graft] def topKWith(spark: SparkSession, dir: String,
                              cent: DataFrame, assign: DataFrame,
                              nProbe: Int, k: Int = 10, queryMod: Int = 50,
                              corpus: Similarity.VecCorpus = Similarity.embCorpus): DataFrame = {
    val e = corpus.normalizedOf(spark, dir).join(assign, "vec_id")
    val probes = probesOf(spark, dir, cent, nProbe, queryMod, corpus)

    // search only vectors in the probed lists
    val cos = (dot(col("qv"), col("v")) / (col("qn") * col("norm")))
      .grid6
    probes.join(e, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cosine_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** [[topK]] answered ENTIRELY from index FRAMES — the plain-IVF twin
    * of [[Pq.ivfPqFrom]]: vectors/centroids/assignments arrive as
    * persisted artifacts, so no featurize pass and no k-means run
    * inside the query. */
  private[ops] def topKFrom(vectors: DataFrame, cent: DataFrame,
                            assign: DataFrame, nProbe: Int, k: Int,
                            queryMod: Int): DataFrame = {
    val q = vectors.filter(AnnParams.queryPred(queryMod))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qn"))
    val qcos = (dot(col("qv"), col("cv")) / (col("qn") * col("cnorm")))
      .grid6
    val probes = q.crossJoin(Bcast.ifBounded(cent, Bcast.SqrtLaw))
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id"),
        qcos.as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("centroid_id"))))
      .filter(col("rk") <= nProbe)
      .select("query_id", "qv", "qn", "centroid_id")
    val e = vectors.join(assign, "vec_id")
    val cos = (dot(col("qv"), col("v")) / (col("qn") * col("norm")))
      .grid6
    probes.join(e, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cosine_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** The held-out-batch split for the index-maintenance demonstration:
    * vectors with `vec_id % 10 == 7` arrive AFTER the index was built on
    * the other ~90%.
    */
  private val appendMod = 10
  private val appendRem = 7

  /** The base (pre-append) vector corpus — same [[Similarity.VecCorpus]]
    * plumbing the derived-featurizer corpus uses, so the centroid build
    * and knob formulas run unchanged on the subset.
    */
  lazy val baseCorpus: Similarity.VecCorpus = Similarity.VecCorpus(
    key = "ivb",
    countTable = s"(SELECT * FROM embeddings WHERE vec_id % $appendMod != $appendRem)",
    normalizedOf = (s, d) => Similarity.normalized(s, d)
      .filter(col("vec_id") % appendMod =!= appendRem),
    countOf = (s, d) => graft.Tables.embeddings(s, d)
      .filter(col("vec_id") % appendMod =!= appendRem).count(),
    embCte = s"""emb AS MATERIALIZED (
                |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
                |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
                |  FROM embeddings WHERE vec_id % $appendMod != $appendRem
                |)""".stripMargin)

  /** Incremental index maintenance — what a production vector store does
    * between periodic rebuilds: a NEW batch of vectors is folded into an
    * EXISTING IVF index by assigning each to its nearest frozen centroid
    * (no recluster, no touch of the already-indexed corpus), and the
    * per-list growth is reported with a rebalance trigger.
    *
    * The index is built on the base ~90% of the corpus (`vec_id % 10 !=
    * 7`); the held-out 10% is the arriving batch. `needs_split` flags a
    * list whose post-append size exceeds 2× the mean base list — the
    * signal that drift has concentrated and a recluster (or list split,
    * à la FAISS's IVF rebuild guidance) is due. The flag compares exact
    * integers (`n_after · nc > 2 · n_base_total`), so both engines
    * branch identically.
    *
    * At 100 TB this is the plan you want: the batch (small) cross-joins
    * only the broadcast √-law centroid table; the indexed corpus is
    * never rescanned; the report aggregates are centroid-grain.
    */
  def appendReport(spark: SparkSession, dir: String): DataFrame = {
    val cent = centroids(spark, dir, baseCorpus)
    val baseAssign = assignments(spark, dir, baseCorpus)
    val batch = Similarity.normalized(spark, dir)
      .filter(col("vec_id") % appendMod === appendRem)
    val newAssign = hierarchicalAssign(batch, cent,
      coarseN(spark, dir, baseCorpus))
    val nBaseTotal = AnnParams.corpusSizeOf(spark, dir, baseCorpus)
    val nc = AnnParams.nCentroids(nBaseTotal)
    baseAssign.groupBy("centroid_id").agg(count(lit(1)).as("n_base"))
      .join(newAssign.groupBy("centroid_id").agg(count(lit(1)).as("nn")),
        Seq("centroid_id"), "left")
      .select(col("centroid_id"), col("n_base"),
        coalesce(col("nn"), lit(0L)).as("n_new"))
      .withColumn("n_after", col("n_base") + col("n_new"))
      .withColumn("needs_split",
        col("n_after") * lit(nc.toLong) > lit(2L * nBaseTotal))
  }

  /** [[appendReport]] composed with the persisted-index protocol —
    * incremental maintenance ACROSS sessions: the first session commits
    * the base index (centroids + assignments) via
    * [[graft.io.AtomicPublish]]; every session after that loads the
    * PERSISTED centroids — frozen, never retrained — assigns ONLY the
    * arriving batch against them, and folds by SLICE REPLACEMENT
    * (committed assignments minus the batch slice, union the fresh
    * batch assignment — the same idempotent day-replacement idiom as
    * the HLL state fold, so re-running a session can never double a
    * row) under a retention window of 2. The growth report derives
    * entirely from the newly COMMITTED artifact: n_base from its base
    * slice, n_new from its batch slice. Output shape (and therefore
    * the oracle) is exactly [[appendReport]]'s.
    */
  def appendCommit(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "ivf_append_persisted", dir, "ivf_append_persisted") {
      import graft.io.AtomicPublish
      // "2": artifact-format version (grid6 sweep: DECIMAL → DOUBLE)
      val base = graft.io.FsUtil.stateDir("ivfinc2", dir)
      if (!AtomicPublish.exists(spark, base))
        AtomicPublish.publish(spark, base, Seq(
          "centroids" -> centroids(spark, dir, baseCorpus),
          "assignments" -> assignments(spark, dir, baseCorpus)), retain = 2)
      // the maintenance session: only committed artifacts + the batch
      val cent = AtomicPublish.read(spark, base, "centroids")
      val batch = Similarity.normalized(spark, dir)
        .filter(col("vec_id") % appendMod === appendRem)
      val newAssign = hierarchicalAssign(batch, cent,
        coarseN(spark, dir, baseCorpus))
      val folded = AtomicPublish.read(spark, base, "assignments")
        .filter(col("vec_id") % appendMod =!= appendRem)
        .unionByName(newAssign)
      AtomicPublish.publish(spark, base, Seq(
        "centroids" -> cent, "assignments" -> folded), retain = 2)
      val committed = AtomicPublish.read(spark, base, "assignments")
      val nBaseTotal = AnnParams.corpusSizeOf(spark, dir, baseCorpus)
      val nc = AnnParams.nCentroids(nBaseTotal)
      committed.filter(col("vec_id") % appendMod =!= appendRem)
        .groupBy("centroid_id").agg(count(lit(1)).as("n_base"))
        .join(committed.groupBy("centroid_id").agg(count(lit(1)).as("na")),
          Seq("centroid_id"))
        .select(col("centroid_id"), col("n_base"),
          (col("na") - col("n_base")).as("n_new"))
        .withColumn("n_after", col("n_base") + col("n_new"))
        .withColumn("needs_split",
          col("n_after") * lit(nc.toLong) > lit(2L * nBaseTotal))
    }

  def appendReportSql: String =
    s"""WITH ${baseCorpus.embCte}, ${centroidsCteFor(baseCorpus.countTable)}, newv AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
       |  FROM embeddings WHERE vec_id % $appendMod = $appendRem
       |), ${hierCte("app", "ivf_centroids", "newv")}, base AS (
       |  SELECT centroid_id, COUNT(*) AS n_base FROM ivf_assign GROUP BY 1
       |), newc AS (
       |  SELECT centroid_id, COUNT(*) AS n_new FROM app_assign GROUP BY 1
       |), t AS (SELECT COUNT(*) AS n_base_total FROM emb)
       |SELECT b.centroid_id, CAST(b.n_base AS BIGINT) AS n_base,
       |       CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
       |       CAST(b.n_base + COALESCE(n.n_new, 0) AS BIGINT) AS n_after,
       |       (b.n_base + COALESCE(n.n_new, 0)) * (SELECT nc FROM ivf_params)
       |         > 2 * t.n_base_total AS needs_split
       |FROM base b LEFT JOIN newc n USING (centroid_id), t""".stripMargin

  /** Metadata-FILTERED IVF top-k — the probed scale path of
    * [[Similarity.filteredTopK]]: same probe stage (nProbe nearest
    * lists), but the admissibility predicate (neighbor label == query
    * label) is applied to the inverted-list rows BEFORE scoring, so
    * inadmissible vectors are neither scored nor ranked. This is the
    * pre-filter execution order a production vector store uses when the
    * filter is selective: with lists stored label-partitioned the
    * predicate prunes at the scan, and the per-query candidate count
    * drops from nProbe·list to nProbe·list/|labels|. (Post-filtering a
    * top-k would instead silently return < k admissible rows even when
    * the lists held more — the classic filtered-ANN bug.)
    */
  def filteredTopK(spark: SparkSession, dir: String, k: Int = 10,
                   queryMod: Int = 50): DataFrame = {
    val nProbe = AnnParams.nProbe(AnnParams.corpusSize(spark, dir))
    val e = Similarity.normalized(spark, dir)
      .join(assignments(spark, dir), "vec_id")
    val probes = probesOf(spark, dir, centroids(spark, dir),
      nProbe, queryMod)
      .join(Similarity.normalized(spark, dir)
        .select(col("vec_id").as("query_id"), col("label").as("qlabel")),
        "query_id")
    val cos = (dot(col("qv"), col("v")) / (col("qn") * col("norm")))
      .grid6
    probes.join(e, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id") && col("label") === col("qlabel"))
      .select(col("query_id"), col("qlabel").as("label"),
        col("vec_id").as("neighbor_id"), cos.as("cosine_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  def filteredTopKSql(k: Int = 10, queryMod: Int = 50): String =
    s"""WITH ${Similarity.normCte}, $centroidsCte, ${AnnParams.nProbeSql}, ea AS (
       |  SELECT e.*, a.centroid_id FROM emb e JOIN ivf_assign a USING (vec_id)
       |), q AS (
       |  SELECT vec_id AS query_id, v AS qv, norm AS qn, label AS qlabel
       |  FROM ea WHERE ${AnnParams.queryPredSql(queryMod)}
       |), probes AS (
       |  SELECT query_id, qv, qn, qlabel, centroid_id FROM (
       |    SELECT q.query_id, q.qv, q.qn, q.qlabel, c.centroid_id,
       |           row_number() OVER (PARTITION BY q.query_id ORDER BY
       |             floor((list_dot_product(q.qv, c.cv) / (q.qn * c.cnorm)) * 1e6 + 0.5) / 1e6 DESC,
       |             c.centroid_id) AS rk
       |    FROM q CROSS JOIN ivf_centroids c
       |  ) WHERE rk <= (SELECT np FROM nprobe_params)
       |), scored AS (
       |  SELECT p.query_id, p.qlabel AS label, e.vec_id AS neighbor_id,
       |         floor((list_dot_product(p.qv, e.v) / (p.qn * e.norm)) * 1e6 + 0.5) / 1e6 AS cosine_sim
       |  FROM probes p JOIN ea e USING (centroid_id)
       |  WHERE e.vec_id != p.query_id AND e.label = p.qlabel
       |)
       |SELECT query_id, label, neighbor_id,
       |       CAST(cosine_sim AS DOUBLE) AS cosine_sim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin

  // ---------- DuckDB oracles ----------

  /** Hierarchical-assignment CTE block over centroid table `cent`,
    * emitting `<p>_coarse`, `<p>_cell_of`, `<p>_vec_cell`, `<p>_assign`.
    * Mirrors [[hierarchicalAssign]] exactly (same `grid6` rounding,
    * same lower-id tiebreaks).
    */
  private def hierCte(p: String, cent: String, src: String = "emb"): String =
    s"""${p}_coarse AS MATERIALIZED (
       |  SELECT centroid_id AS coarse_id, cv AS gv, cnorm AS gnorm
       |  FROM $cent
       |  WHERE centroid_id < GREATEST(1, CAST(floor(sqrt(CAST((SELECT nc FROM ivf_params) AS DOUBLE))) AS BIGINT))
       |), ${p}_cell_of AS MATERIALIZED (
       |  SELECT centroid_id, cv, cnorm, coarse_id FROM (
       |    SELECT f.centroid_id, f.cv, f.cnorm, g.coarse_id,
       |           row_number() OVER (PARTITION BY f.centroid_id ORDER BY
       |             floor((list_dot_product(f.cv, g.gv) / (f.cnorm * g.gnorm)) * 1e6 + 0.5) / 1e6 DESC,
       |             g.coarse_id) AS rk
       |    FROM $cent f CROSS JOIN ${p}_coarse g
       |  ) WHERE rk = 1
       |), ${p}_vec_cell AS MATERIALIZED (
       |  SELECT vec_id, v, norm, coarse_id FROM (
       |    SELECT e.vec_id, e.v, e.norm, g.coarse_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             floor((list_dot_product(e.v, g.gv) / (e.norm * g.gnorm)) * 1e6 + 0.5) / 1e6 DESC,
       |             g.coarse_id) AS rk
       |    FROM $src e CROSS JOIN ${p}_coarse g
       |  ) WHERE rk = 1
       |), ${p}_assign AS MATERIALIZED (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT vc.vec_id, co.centroid_id,
       |           row_number() OVER (PARTITION BY vc.vec_id ORDER BY
       |             floor((list_dot_product(vc.v, co.cv) / (vc.norm * co.cnorm)) * 1e6 + 0.5) / 1e6 DESC,
       |             co.centroid_id) AS rk
       |    FROM ${p}_vec_cell vc JOIN ${p}_cell_of co USING (coarse_id)
       |  ) WHERE rk = 1
       |)""".stripMargin

  /** One Lloyd step in SQL: hierarchical assignment to `cent`, then the
    * integer-quantized per-list means — emits `<p>_*` assignment CTEs,
    * `<p>_means`, and the refined centroid table `out`.
    */
  private def refineCte(p: String, cent: String, out: String): String =
    s"""${hierCte(p, cent)}, ${p}_means AS MATERIALIZED (
       |  SELECT a.centroid_id, CAST(i.i AS INT) AS pos,
       |         CAST(SUM(CAST(round(e.v[CAST(i.i AS INT) + 1] * 1000000.0) AS BIGINT)) AS DOUBLE)
       |           / (count(*) * 1000000.0) AS m
       |  FROM ${p}_assign a JOIN emb e USING (vec_id)
       |  CROSS JOIN range(0, ${Similarity.dim}) i(i)
       |  GROUP BY 1, 2
       |), $out AS MATERIALIZED (
       |  SELECT centroid_id, cv, sqrt(list_dot_product(cv, cv)) AS cnorm FROM (
       |    SELECT centroid_id, list(m ORDER BY pos) AS cv
       |    FROM ${p}_means GROUP BY centroid_id
       |  )
       |)""".stripMargin

  /** Seeds → [[refineRounds]] Lloyd steps → final `ivf_assign` over the
    * refined `ivf_centroids` — knob count from `countTable` (the SQL
    * twin of the corpus parameterization; requires an `emb` CTE in
    * scope whatever its provenance).
    */
  def centroidsCteFor(countTable: String): String = {
    val rounds = (1 to refineRounds).map { r =>
      val in = if (r == 1) "ivf_seeds" else s"ivf_cent_${r - 1}"
      val out = if (r == refineRounds) "ivf_centroids" else s"ivf_cent_$r"
      refineCte(s"ivr$r", in, out)
    }.mkString(", ")
    s"""${AnnParams.nCentroidsSqlFor(countTable)}, ivf_seeds AS MATERIALIZED (
       |  SELECT vec_id AS centroid_id, v AS cv, norm AS cnorm
       |  FROM emb WHERE vec_id < (SELECT nc FROM ivf_params)
       |), $rounds, ${hierCte("ivf", "ivf_centroids")}""".stripMargin
  }

  val centroidsCte: String = centroidsCteFor("embeddings")

  val assignmentsSql: String =
    s"WITH ${Similarity.normCte}, $centroidsCte SELECT vec_id, centroid_id FROM ivf_assign"

  val listStatsSql: String =
    s"""WITH ${Similarity.normCte}, $centroidsCte
       |SELECT centroid_id, count(*) AS n_vectors FROM ivf_assign GROUP BY 1""".stripMargin

  def topKSql(k: Int = 10, queryMod: Int = 50): String =
    topKSqlFor(k, queryMod, Similarity.normCte, "embeddings")

  /** [[topKSql]] over an arbitrary `emb` CTE + knob table — the oracle
    * twin of `topK(..., corpus)`.
    */
  def topKSqlFor(k: Int, queryMod: Int, embCte: String,
                 countTable: String): String =
    s"""WITH $embCte, ${centroidsCteFor(countTable)}, ${AnnParams.nProbeSql}, ea AS (
       |  SELECT e.*, a.centroid_id FROM emb e JOIN ivf_assign a USING (vec_id)
       |), q AS (
       |  SELECT vec_id AS query_id, v AS qv, norm AS qn
       |  FROM ea WHERE ${AnnParams.queryPredSql(queryMod)}
       |), probes AS (
       |  SELECT query_id, qv, qn, centroid_id FROM (
       |    SELECT q.query_id, q.qv, q.qn, c.centroid_id,
       |           row_number() OVER (PARTITION BY q.query_id ORDER BY
       |             floor((list_dot_product(q.qv, c.cv) / (q.qn * c.cnorm)) * 1e6 + 0.5) / 1e6 DESC,
       |             c.centroid_id) AS rk
       |    FROM q CROSS JOIN ivf_centroids c
       |  ) WHERE rk <= (SELECT np FROM nprobe_params)
       |), scored AS (
       |  SELECT p.query_id, e.vec_id AS neighbor_id,
       |         floor((list_dot_product(p.qv, e.v) / (p.qn * e.norm)) * 1e6 + 0.5) / 1e6 AS cosine_sim
       |  FROM probes p JOIN ea e USING (centroid_id)
       |  WHERE e.vec_id != p.query_id
       |)
       |SELECT query_id, neighbor_id, CAST(cosine_sim AS DOUBLE) AS cosine_sim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin
}
