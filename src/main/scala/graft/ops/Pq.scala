package graft.ops

import graft.Bcast

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the vector-compression half of the
  * trillion-scale ANN design (IVF-PQ; Jégou et al., TPAMI'11, "Product
  * Quantization for Nearest Neighbor Search" — public technique). The
  * 64-dim embedding splits into [[numSub]] = 8 subspaces of 8 dims; each
  * subspace gets a [[numCodes]] = 16-codeword codebook, so a vector is
  * stored as 8 four-bit codes — 4 bytes against 256 for the raw floats, a
  * 64× compression that is what makes a 100 TB corpus scannable: the ADC
  * scan touches only the codes plus a per-query lookup table of
  * queries × 8 × 16 partial dot products.
  *
  * Codebook training follows the [[Ivf]] template exactly: seeds = the
  * first [[numCodes]] corpus vectors' subvectors, then one Lloyd round
  * with per-dimension means in order-independent integer arithmetic
  * (Σ round(x·10⁶) as long, one double division), so the whole chain is
  * deterministic and DuckDB-oracle-checkable. Codebook size is FIXED by
  * design, not corpus-scaled like the [[AnnParams]] knobs: 4-bit codes
  * are the storage contract; capacity scales by pairing PQ with IVF
  * lists (coarse cell + per-cell residual codes), not by widening codes.
  *
  * Assignment ranks codewords by squared L2 distance expressed as
  * `sv·sv − 2·sv·cw + cw·cw` — three [[Similarity.dot]] products, the one
  * float primitive with a proven bit-identical DuckDB twin
  * (`list_dot_product`) — `grid6`-rounded with lower-code
  * tiebreaks, like every ranking in the similarity stack.
  *
  * Scale notes: encoding is O(n·8·16) comparisons via a broadcast
  * equi-join on the subspace id — linear with a constant 128, embarrassed
  * parallel. The ADC join (`codes ⋈ lut on (sub, code)`) fans out to
  * n·8·|queries| rows — the honest cost of scanning a compressed corpus;
  * IVF probe lists bound the n. Partial dots are summed as
  * DECIMAL(18,9) (order-independent; a double sum's low bits would
  * depend on which partitions deliver the 8 rows of a group first).
  */
object Pq {

  val numSub = 8
  val subDim: Int = Similarity.dim / numSub
  val numCodes = 16

  private def dot(a: Column, b: Column): Column = Similarity.dot(a, b)

  /** Exploded (vec_id, sub, sv) subvectors — shared by training,
    * encoding, and the query LUT.
    */
  private def subvectors(spark: SparkSession, dir: String,
                         c: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    graft.Memo(spark, c.memoName("pq_subvectors"), dir,
      c.memoName("pq_subvectors")) {
      val subs = (0 until numSub).map(s =>
        struct(lit(s).as("sub"), slice(col("v"), s * subDim + 1, subDim).as("sv")))
      c.normalizedOf(spark, dir)
        .select(col("vec_id"), explode(array(subs: _*)).as("e"))
        .select(col("vec_id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
    }

  /** Per-(vec, sub) nearest codeword: squared-L2 rank, DECIMAL-rounded,
    * lower code on ties.
    */
  private def assign(sv: DataFrame, cb: DataFrame): DataFrame = {
    val d2 = (dot(col("sv"), col("sv")) - lit(2.0) * dot(col("sv"), col("cw")) +
      dot(col("cw"), col("cw"))).grid6
    sv.join(Bcast.ifBounded(cb, Bcast.Params), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("code"), d2.as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id", "sub").orderBy(col("d2"), col("code"))))
      .filter(col("rk") === 1)
      .select("vec_id", "sub", "code")
  }

  /** One Lloyd round over an arbitrary subvector table, seeded with the
    * first [[numCodes]] vectors' subvectors (integer-quantized means, see
    * [[Ivf.refineRounds]] for the arithmetic rationale) — shared by the
    * raw-vector and residual codebooks.
    */
  private def lloydCodebooks(sv: DataFrame): DataFrame = {
    val seeds = sv.filter(col("vec_id") < numCodes)
      .select(col("sub"), col("vec_id").as("code"), col("sv").as("cw"))
    val means = assign(sv, seeds)
      .join(sv, Seq("vec_id", "sub"))
      .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy("sub", "code", "pos")
      .agg((sum(round(col("x") * lit(1e6)).cast("long")).cast("double") /
        (count(lit(1)) * lit(1e6))).as("m"))
    means.groupBy("sub", "code")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cw"))
  }

  def codebooks(spark: SparkSession, dir: String,
                c: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    graft.Memo(spark, c.memoName("pq_codebooks"), dir,
      c.memoName("pq_codebooks")) {
      lloydCodebooks(subvectors(spark, dir, c))
    }

  /** The stored artifact: (vec_id, sub, code) — 8 four-bit codes per
    * vector.
    */
  def codes(spark: SparkSession, dir: String,
            c: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    graft.Memo(spark, c.memoName("pq_codes"), dir, c.memoName("pq_codes")) {
      assign(subvectors(spark, dir, c), codebooks(spark, dir, c))
    }

  // ---------- residual encoding (true IVF-PQ, Jégou TPAMI'11 §IV) ----------
  //
  // IVF-PQ at production quality encodes the RESIDUAL v − centroid(v),
  // not v: within a list the residuals are centered near zero with far
  // smaller spread than the raw vectors, so the same 4-bit budget spends
  // its 16 codewords on the part of v the coarse quantizer did NOT
  // explain. One shared codebook is trained on the residuals of ALL
  // lists (standard IVFADC). The ADC score decomposes exactly:
  //   q·v̂ = q·c + Σ_sub q_sub·cw_sub   (c = list centroid, cw = codeword)
  //   ‖v̂‖² = c·c + 2·Σ_sub c_sub·cw_sub + Σ_sub cw_sub·cw_sub
  // — every term a single fixed-order dot product or an exact DECIMAL
  // sum, so the chain stays DuckDB-oracle-checkable.

  /** (vec_id, centroid_id, rv = v − centroid): exact element-wise IEEE
    * subtraction of the vector and its refined IVF centroid.
    */
  private def residuals(spark: SparkSession, dir: String,
                        c: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    graft.Memo(spark, c.memoName("pqr_residuals"), dir,
      c.memoName("pqr_residuals")) {
      c.normalizedOf(spark, dir)
        .join(Ivf.assignments(spark, dir, c), "vec_id")
        .join(Bcast.ifBounded(Ivf.centroids(spark, dir, c), Bcast.SqrtLaw), "centroid_id")
        .select(col("vec_id"), col("centroid_id"),
          zip_with(col("v"), col("cv"), (x, y) => x - y).as("rv"))
    }

  /** Exploded (vec_id, sub, sv) RESIDUAL subvectors. */
  private def rsubvectors(spark: SparkSession, dir: String,
                          c: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    graft.Memo(spark, c.memoName("pqr_subvectors"), dir,
      c.memoName("pqr_subvectors")) {
      val subs = (0 until numSub).map(s =>
        struct(lit(s).as("sub"), slice(col("rv"), s * subDim + 1, subDim).as("sv")))
      residuals(spark, dir, c)
        .select(col("vec_id"), explode(array(subs: _*)).as("e"))
        .select(col("vec_id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
    }

  /** The shared residual codebook (same seeding + one Lloyd round as the
    * raw codebook, trained on residual subvectors pooled over all lists).
    */
  def residualCodebooks(spark: SparkSession, dir: String,
                        c: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    graft.Memo(spark, c.memoName("pqr_codebooks"), dir,
      c.memoName("pqr_codebooks")) {
      lloydCodebooks(rsubvectors(spark, dir, c))
    }

  /** (vec_id, sub, code) over the residual codebook — what an IVF-PQ
    * index actually stores per list entry.
    */
  def residualCodes(spark: SparkSession, dir: String,
                    c: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    graft.Memo(spark, c.memoName("pqr_codes"), dir, c.memoName("pqr_codes")) {
      assign(rsubvectors(spark, dir, c), residualCodebooks(spark, dir, c))
    }

  /** ADC (asymmetric distance computation) top-k: the query keeps its raw
    * vector; every corpus vector is scored purely through its codes — a
    * per-query LUT of subspace×codeword partial dots, summed per
    * neighbor, normalized by the codeword-reconstruction norm.
    */
  def topK(spark: SparkSession, dir: String, k: Int = 10,
           queryMod: Int = 50): DataFrame =
    graft.Memo(spark, s"pq_topk_${k}_$queryMod", dir, "pq_topk") {
      val cb = codebooks(spark, dir)
      val cd = codes(spark, dir)
      val qn = Similarity.normalized(spark, dir)
        .filter(AnnParams.queryPred(queryMod))
        .select(col("vec_id").as("query_id"), col("norm").as("qn"))

      val lut = subvectors(spark, dir)
        .filter(AnnParams.queryPred(queryMod))
        .withColumnRenamed("vec_id", "query_id")
        .join(Bcast.ifBounded(cb, Bcast.Params), Seq("sub"))
        .select(col("query_id"), col("sub"), col("code"),
          dot(col("sv"), col("cw")).cast("decimal(18,9)").as("pd"))

      // reconstruction norm: sqrt of the summed codeword self-dots
      val cww = cb.select(col("sub"), col("code"),
        dot(col("cw"), col("cw")).cast("decimal(18,9)").as("w2"))
      val rn = cd.join(Bcast.ifBounded(cww, Bcast.Params), Seq("sub", "code"))
        .groupBy("vec_id").agg(sqrt(sum(col("w2")).cast("double")).as("rnorm"))

      val ad = cd.join(Bcast.ifBounded(lut, Bcast.QueryBatch), Seq("sub", "code"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
        .agg(sum(col("pd")).as("ad"))
      val sim = (col("ad").cast("double") / (col("qn") * col("rnorm")))
        .grid6
      ad.join(qn, "query_id")
        .join(rn, col("neighbor_id") === rn("vec_id"))
        .select(col("query_id"), col("neighbor_id"), sim.as("adc_sim"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("adc_sim").desc, col("neighbor_id"))))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"),
          col("adc_sim").cast("double").as("adc_sim"), col("rank"))
    }

  /** ADC shortlist → exact rerank — the standard production shape: the
    * compressed scan proposes `shortlist` candidates per query (cheap,
    * codes only), then the raw vectors of JUST those candidates are
    * fetched and scored exactly. Retrieval quality recovers most of what
    * 4-bit codes lose (measured in pq_recall: 'pq' vs 'pq_rerank'),
    * while the raw-float reads stay O(queries × shortlist) instead of
    * O(n) — at 100 TB that is the difference between touching gigabytes
    * and touching everything.
    */
  def rerankTopK(spark: SparkSession, dir: String, k: Int = 10,
                 shortlist: Int = 100, queryMod: Int = 50): DataFrame =
    graft.Memo(spark, s"pq_rerank_${k}_${shortlist}_$queryMod", dir, "pq_rerank") {
      rerankOf(spark, dir,
        topK(spark, dir, shortlist, queryMod).select("query_id", "neighbor_id"),
        k, queryMod)
    }

  /** Exact-cosine rerank of an arbitrary (query_id, neighbor_id)
    * candidate set — shared by [[rerankTopK]] and [[ivfPqTopK]].
    */
  private def rerankOf(spark: SparkSession, dir: String, cands: DataFrame,
                       k: Int, queryMod: Int,
                       c: Similarity.VecCorpus = Similarity.embCorpus): DataFrame = {
    val e = c.normalizedOf(spark, dir)
    val q = e.filter(AnnParams.queryPred(queryMod))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qn"))
    val cos = (dot(col("qv"), col("v")) / (col("qn") * col("norm")))
      .grid6
    cands.join(q, "query_id")
      .join(e, col("neighbor_id") === e("vec_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cosine_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cosine_sim").cast("double").as("cosine_sim"), col("rank"))
  }

  /** IVF-PQ — the full trillion-scale retrieval stack composed: IVF
    * probes bound WHICH vectors are touched ([[AnnParams.nProbe]] lists
    * out of ≈√(n/4)), RESIDUAL PQ codes bound HOW MUCH is read per
    * touched vector (4 bytes — see [[residualCodes]]), and the exact
    * rerank of the surviving shortlist restores precision. Per query the
    * raw-float reads are O(shortlist); the code reads are
    * O(n/√n·nProbe) — at no stage does the full corpus leave its
    * compressed, list-partitioned form.
    *
    * ADC scoring reconstructs v̂ = centroid + Σ codewords implicitly:
    * numerator q·v̂ = q·c (one dot per probed (query, list) pair — only
    * nProbe per query) + the residual LUT sum; ‖v̂‖ comes from the
    * per-(list, sub, code) centroid–codeword dot table `ccw`
    * (≈ √(n/4)·128 rows — broadcastable at any n where √-law holds).
    */
  def ivfPqTopK(spark: SparkSession, dir: String, k: Int = 10,
                shortlist: Int = 100, queryMod: Int = 50,
                corpus: Similarity.VecCorpus = Similarity.embCorpus): DataFrame =
    graft.Memo(spark,
      corpus.memoName(s"ivfpq_topk_${k}_${shortlist}_$queryMod"), dir,
      corpus.memoName("ivfpq_topk")) {
      ivfPqFrom(
        corpus.normalizedOf(spark, dir),
        Ivf.centroids(spark, dir, corpus),
        Ivf.assignments(spark, dir, corpus),
        residualCodebooks(spark, dir, corpus),
        residualCodes(spark, dir, corpus),
        AnnParams.nProbe(AnnParams.corpusSizeOf(spark, dir, corpus)),
        k, shortlist, queryMod)
    }

  /** The IVF-PQ search chain over EXPLICIT index frames — the serving
    * core shared by [[ivfPqTopK]] (frames from the memoized in-session
    * build) and [[AnnIndex.serve]] (frames loaded from the persisted
    * index, no corpus recompute). Arithmetic is identical either way,
    * so both paths hash-match the same oracle.
    */
  private[ops] def ivfPqFrom(vectors: DataFrame, cent: DataFrame,
                             assign: DataFrame, cb: DataFrame,
                             rcodes: DataFrame, nProbe: Int,
                             k: Int, shortlist: Int, queryMod: Int): DataFrame = {
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
    val cands = probes.select("query_id", "centroid_id")
      .join(assign, "centroid_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "centroid_id")

    // residual LUT: raw query subvector · residual codeword
    val qsubs = (0 until numSub).map(s =>
      struct(lit(s).as("sub"), slice(col("qv"), s * subDim + 1, subDim).as("sv")))
    val lut = q.select(col("query_id"), explode(array(qsubs: _*)).as("e"))
      .select(col("query_id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
      .join(Bcast.ifBounded(cb, Bcast.Params), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        dot(col("sv"), col("cw")).cast("decimal(18,9)").as("pd"))
    // q·centroid + query norm, per probed (query, list) pair
    val qc = probes.join(Bcast.ifBounded(cent, Bcast.SqrtLaw), "centroid_id")
      .select(col("query_id"), col("centroid_id"),
        dot(col("qv"), col("cv")).cast("decimal(18,9)").as("qc"),
        col("qn"))
    // centroid-subvector · codeword and codeword self-dot, per
    // (list, sub, code) — the reconstruction-norm building blocks
    val csubs = (0 until numSub).map(s =>
      struct(lit(s).as("sub"), slice(col("cv"), s * subDim + 1, subDim).as("csv")))
    val ccw = cent
      .select(col("centroid_id"), explode(array(csubs: _*)).as("e"))
      .select(col("centroid_id"), col("e.sub").as("sub"), col("e.csv").as("csv"))
      .join(Bcast.ifBounded(cb, Bcast.Params), Seq("sub"))
      .select(col("centroid_id"), col("sub"), col("code"),
        dot(col("csv"), col("cw")).cast("decimal(18,9)").as("cc"),
        dot(col("cw"), col("cw")).cast("decimal(18,9)").as("w2"))
    val cself = cent.select(col("centroid_id"),
      dot(col("cv"), col("cv")).cast("decimal(18,9)").as("c2"))
    // ‖v̂‖ = sqrt(c·c + 2·Σ c_sub·cw + Σ cw·cw) — exact DECIMAL sums
    val rn = rcodes
      .join(assign, "vec_id")
      .join(Bcast.ifBounded(ccw, Bcast.SqrtLaw), Seq("centroid_id", "sub", "code"))
      .groupBy("vec_id", "centroid_id")
      .agg(sum(col("cc")).as("scc"), sum(col("w2")).as("sw2"))
      .join(Bcast.ifBounded(cself, Bcast.SqrtLaw), "centroid_id")
      .select(col("vec_id"),
        sqrt((col("c2") + lit(2) * col("scc") + col("sw2")).cast("double"))
          .as("rnorm"))

    val ad = rcodes.join(cands, "vec_id")
      .join(Bcast.ifBounded(lut, Bcast.QueryBatch), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"),
        col("centroid_id"))
      .agg(sum(col("pd")).as("ad"))
    val sim = ((col("qc") + col("ad")).cast("double") /
      (col("qn") * col("rnorm"))).grid6
    val short = ad.join(qc, Seq("query_id", "centroid_id"))
      .join(rn, col("neighbor_id") === rn("vec_id"))
      .select(col("query_id"), col("neighbor_id"), sim.as("adc_sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adc_sim").desc, col("neighbor_id"))))
      .filter(col("rk") <= shortlist)
      .select("query_id", "neighbor_id")

    // exact-cosine rerank of the shortlist from the stored raw vectors
    val e2 = vectors
    val q2 = vectors.filter(AnnParams.queryPred(queryMod))
      .select(col("vec_id").as("query_id"), col("v").as("q2v"),
        col("norm").as("q2n"))
    val cos = (dot(col("q2v"), col("v")) / (col("q2n") * col("norm")))
      .grid6
    short.join(q2, "query_id")
      .join(e2, col("neighbor_id") === e2("vec_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cosine_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cosine_sim").cast("double").as("cosine_sim"), col("rank"))
  }

  // ---------- DuckDB oracles ----------

  /** Nearest-codeword assignment CTE over subvector table `sv` against
    * codebook `cbTable` — the SQL twin of [[assign]].
    */
  private def assignCteSql(name: String, cbTable: String, sv: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT t.vec_id, t.sub, c.code,
       |           row_number() OVER (PARTITION BY t.vec_id, t.sub ORDER BY
       |             floor((list_dot_product(t.sv, t.sv)
       |                  - 2 * list_dot_product(t.sv, c.cw)
       |                  + list_dot_product(c.cw, c.cw)) * 1e6 + 0.5) / 1e6,
       |             c.code) AS rk
       |    FROM $sv t JOIN $cbTable c USING (sub)
       |  ) WHERE rk = 1
       |)""".stripMargin

  /** Seed → one-Lloyd-round codebook → codes CTE chain over subvector
    * table `sv`, emitting `<p>_seed`, `<p>_asg0`, `<p>_means`, `<p>_cb`,
    * `<p>_codes` — the SQL twin of [[lloydCodebooks]] + [[assign]].
    */
  private def trainCteSql(p: String, sv: String): String =
    s"""${p}_seed AS MATERIALIZED (
       |  SELECT sub, vec_id AS code, sv AS cw FROM $sv WHERE vec_id < $numCodes
       |), ${assignCteSql(s"${p}_asg0", s"${p}_seed", sv)}, ${p}_means AS MATERIALIZED (
       |  SELECT a.sub, a.code, CAST(i.i AS INT) AS pos,
       |         CAST(SUM(CAST(round(t.sv[CAST(i.i AS INT) + 1] * 1000000.0) AS BIGINT)) AS DOUBLE)
       |           / (count(*) * 1000000.0) AS m
       |  FROM ${p}_asg0 a JOIN $sv t USING (vec_id, sub)
       |  CROSS JOIN range(0, $subDim) i(i)
       |  GROUP BY 1, 2, 3
       |), ${p}_cb AS MATERIALIZED (
       |  SELECT sub, code, list(m ORDER BY pos) AS cw
       |  FROM ${p}_means GROUP BY 1, 2
       |), ${assignCteSql(s"${p}_codes", s"${p}_cb", sv)}""".stripMargin

  /** Subvector + codebook-training CTE block: `psub` (exploded
    * subvectors), `pq_cb` (the one-Lloyd-round codebooks), `pq_codes`.
    * Requires [[Similarity.normCte]]'s `emb` in scope.
    */
  val codesCte: String =
    s"""psub AS MATERIALIZED (
       |  SELECT vec_id, CAST(s.s AS INT) AS sub,
       |         v[CAST(s.s AS INT) * $subDim + 1 : CAST(s.s AS INT) * $subDim + $subDim] AS sv
       |  FROM emb CROSS JOIN range(0, $numSub) s(s)
       |), ${trainCteSql("pq", "psub")}""".stripMargin

  /** Residual subvector + codebook + codes CTE block (`pqr_sub`,
    * `pqr_cb`, `pqr_codes`) — the SQL twin of [[residuals]] /
    * [[residualCodebooks]] / [[residualCodes]]. Requires `emb`,
    * `ivf_assign` and `ivf_centroids` in scope.
    */
  val residualCodesCte: String =
    s"""pqr_res AS MATERIALIZED (
       |  SELECT e.vec_id, a.centroid_id,
       |         list_transform(range(1, ${Similarity.dim + 1}), i -> e.v[i] - c.cv[i]) AS rv
       |  FROM emb e JOIN ivf_assign a USING (vec_id)
       |  JOIN ivf_centroids c USING (centroid_id)
       |), pqr_sub AS MATERIALIZED (
       |  SELECT vec_id, CAST(s.s AS INT) AS sub,
       |         rv[CAST(s.s AS INT) * $subDim + 1 : CAST(s.s AS INT) * $subDim + $subDim] AS sv
       |  FROM pqr_res CROSS JOIN range(0, $numSub) s(s)
       |), ${trainCteSql("pqr", "pqr_sub")}""".stripMargin

  val codesSql: String =
    s"WITH ${Similarity.normCte}, $codesCte SELECT vec_id, sub, code FROM pq_codes"

  def topKSql(k: Int = 10, queryMod: Int = 50): String =
    s"""WITH ${Similarity.normCte}, $codesCte, lut AS MATERIALIZED (
       |  SELECT t.vec_id AS query_id, t.sub, c.code,
       |         CAST(list_dot_product(t.sv, c.cw) AS DECIMAL(18,9)) AS pd
       |  FROM psub t JOIN pq_cb c USING (sub)
       |  WHERE ${AnnParams.queryPredSql(queryMod, "t.vec_id")}
       |), cww AS MATERIALIZED (
       |  SELECT sub, code,
       |         CAST(list_dot_product(cw, cw) AS DECIMAL(18,9)) AS w2
       |  FROM pq_cb
       |), rn AS MATERIALIZED (
       |  SELECT p.vec_id, sqrt(CAST(SUM(w2) AS DOUBLE)) AS rnorm
       |  FROM pq_codes p JOIN cww USING (sub, code) GROUP BY 1
       |), ad AS MATERIALIZED (
       |  SELECT l.query_id, p.vec_id AS neighbor_id, SUM(l.pd) AS ad
       |  FROM pq_codes p JOIN lut l USING (sub, code)
       |  WHERE p.vec_id != l.query_id
       |  GROUP BY 1, 2
       |), scored AS MATERIALIZED (
       |  SELECT a.query_id, a.neighbor_id,
       |         floor((CAST(a.ad AS DOUBLE) / (e.norm * r.rnorm)) * 1e6 + 0.5) / 1e6 AS adc_sim
       |  FROM ad a
       |  JOIN emb e ON e.vec_id = a.query_id
       |  JOIN rn r ON r.vec_id = a.neighbor_id
       |)
       |SELECT query_id, neighbor_id, CAST(adc_sim AS DOUBLE) AS adc_sim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY adc_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM scored
       |) WHERE rank <= $k""".stripMargin

  def ivfPqSql(k: Int = 10, shortlist: Int = 100, queryMod: Int = 50): String =
    ivfPqSqlFor(k, shortlist, queryMod, Similarity.normCte, "embeddings")

  /** [[ivfPqSql]] over an arbitrary `emb` CTE + knob table — the oracle
    * twin of `ivfPqTopK(..., corpus)`.
    */
  def ivfPqSqlFor(k: Int, shortlist: Int, queryMod: Int,
                  embCte: String, countTable: String): String =
    s"""WITH $embCte, ${Ivf.centroidsCteFor(countTable)}, ${AnnParams.nProbeSql}, psub AS (
       |  SELECT vec_id, CAST(s.s AS INT) AS sub,
       |         v[CAST(s.s AS INT) * $subDim + 1 : CAST(s.s AS INT) * $subDim + $subDim] AS sv
       |  FROM emb CROSS JOIN range(0, $numSub) s(s)
       |), $residualCodesCte, q AS MATERIALIZED (
       |  SELECT vec_id AS query_id, v AS qv, norm AS qn
       |  FROM emb WHERE ${AnnParams.queryPredSql(queryMod)}
       |), probes AS MATERIALIZED (
       |  SELECT query_id, centroid_id FROM (
       |    SELECT q.query_id, c.centroid_id,
       |           row_number() OVER (PARTITION BY q.query_id ORDER BY
       |             floor((list_dot_product(q.qv, c.cv) / (q.qn * c.cnorm)) * 1e6 + 0.5) / 1e6 DESC,
       |             c.centroid_id) AS rk
       |    FROM q CROSS JOIN ivf_centroids c
       |  ) WHERE rk <= (SELECT np FROM nprobe_params)
       |), cands AS MATERIALIZED (
       |  SELECT p.query_id, a.vec_id, a.centroid_id
       |  FROM probes p JOIN ivf_assign a USING (centroid_id)
       |  WHERE a.vec_id != p.query_id
       |), lut AS MATERIALIZED (
       |  SELECT t.vec_id AS query_id, t.sub, c.code,
       |         CAST(list_dot_product(t.sv, c.cw) AS DECIMAL(18,9)) AS pd
       |  FROM psub t JOIN pqr_cb c USING (sub)
       |  WHERE ${AnnParams.queryPredSql(queryMod, "t.vec_id")}
       |), qc AS MATERIALIZED (
       |  SELECT p.query_id, p.centroid_id,
       |         CAST(list_dot_product(q.qv, c.cv) AS DECIMAL(18,9)) AS qc, q.qn
       |  FROM probes p JOIN q USING (query_id)
       |  JOIN ivf_centroids c USING (centroid_id)
       |), ccw AS MATERIALIZED (
       |  SELECT c.centroid_id, b.sub, b.code,
       |         CAST(list_dot_product(
       |           c.cv[b.sub * $subDim + 1 : b.sub * $subDim + $subDim], b.cw)
       |           AS DECIMAL(18,9)) AS cc,
       |         CAST(list_dot_product(b.cw, b.cw) AS DECIMAL(18,9)) AS w2
       |  FROM ivf_centroids c CROSS JOIN pqr_cb b
       |), cself AS MATERIALIZED (
       |  SELECT centroid_id, CAST(list_dot_product(cv, cv) AS DECIMAL(18,9)) AS c2
       |  FROM ivf_centroids
       |), rn AS MATERIALIZED (
       |  SELECT g.vec_id, sqrt(CAST(s.c2 + 2 * g.scc + g.sw2 AS DOUBLE)) AS rnorm
       |  FROM (
       |    SELECT p.vec_id, a.centroid_id, SUM(x.cc) AS scc, SUM(x.w2) AS sw2
       |    FROM pqr_codes p JOIN ivf_assign a USING (vec_id)
       |    JOIN ccw x ON x.centroid_id = a.centroid_id
       |             AND x.sub = p.sub AND x.code = p.code
       |    GROUP BY 1, 2
       |  ) g JOIN cself s USING (centroid_id)
       |), ad AS MATERIALIZED (
       |  SELECT cd.query_id, cd.vec_id AS neighbor_id, cd.centroid_id, SUM(l.pd) AS ad
       |  FROM (SELECT c.query_id, p.vec_id, c.centroid_id, p.sub, p.code
       |        FROM cands c JOIN pqr_codes p USING (vec_id)) cd
       |  JOIN lut l ON l.query_id = cd.query_id AND l.sub = cd.sub AND l.code = cd.code
       |  GROUP BY 1, 2, 3
       |), short AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT a.query_id, a.neighbor_id,
       |           row_number() OVER (PARTITION BY a.query_id ORDER BY
       |             floor((CAST(qc.qc + a.ad AS DOUBLE) / (qc.qn * r.rnorm)) * 1e6 + 0.5) / 1e6 DESC,
       |             a.neighbor_id) AS rk
       |    FROM ad a
       |    JOIN qc ON qc.query_id = a.query_id AND qc.centroid_id = a.centroid_id
       |    JOIN rn r ON r.vec_id = a.neighbor_id
       |  ) WHERE rk <= $shortlist
       |), rescored AS MATERIALIZED (
       |  SELECT s.query_id, s.neighbor_id,
       |         floor((list_dot_product(q2.v, n.v) / (q2.norm * n.norm)) * 1e6 + 0.5) / 1e6 AS cosine_sim
       |  FROM short s
       |  JOIN emb q2 ON q2.vec_id = s.query_id
       |  JOIN emb n ON n.vec_id = s.neighbor_id
       |)
       |SELECT query_id, neighbor_id, CAST(cosine_sim AS DOUBLE) AS cosine_sim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM rescored
       |) WHERE rank <= $k""".stripMargin

  def rerankSql(k: Int = 10, shortlist: Int = 100, queryMod: Int = 50): String =
    s"""WITH ${Similarity.normCteAs("pq_emb")}, cands AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (${topKSql(shortlist, queryMod)})
       |), rescored AS MATERIALIZED (
       |  SELECT c.query_id, c.neighbor_id,
       |         floor((list_dot_product(q.v, n.v) / (q.norm * n.norm)) * 1e6 + 0.5) / 1e6 AS cosine_sim
       |  FROM cands c
       |  JOIN pq_emb q ON q.vec_id = c.query_id
       |  JOIN pq_emb n ON n.vec_id = c.neighbor_id
       |)
       |SELECT query_id, neighbor_id, CAST(cosine_sim AS DOUBLE) AS cosine_sim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM rescored
       |) WHERE rank <= $k""".stripMargin
}
