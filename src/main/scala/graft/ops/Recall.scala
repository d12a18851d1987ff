package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval-quality measurement for the approximate similarity paths:
  * recall@k of [[Similarity.multiprobeTopK]] and [[Ivf.topK]] against the
  * [[Similarity.bruteForceTopK]] exact ground truth. A similarity-search
  * component is only trustworthy with a recall number attached — the
  * approximate paths are correctness-proven (they compute what they
  * claim) but this is the query that proves they *retrieve* well.
  *
  * Output: one row per (method, query) plus one overall row per method
  * (`query_id = -1`). The overall recall is computed as
  * `total_hits / (n_queries · k)` — a single division of exact integers —
  * rather than an AVG over per-query doubles, whose summation order
  * differs between engines (see the oracle-parity rules).
  *
  * Everything here is deterministic (both approximate paths break ties by
  * id on DECIMAL-rounded cosines), so the DuckDB oracle reproduces it
  * exactly by composing the three existing SQL twins.
  */
object Recall {

  private def hitsOf(truth: DataFrame, approx: DataFrame, method: String,
                     k: Int): DataFrame = {
    val hits = truth
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("h"))
    val per = truth.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(lit(method).as("method"), col("query_id"),
        coalesce(col("h"), lit(0L)).as("hits"))
    val overall = per.agg(sum(col("hits")).as("hits"),
        count(lit(1)).as("nq"))
      .select(lit(method).as("method"), lit(-1L).as("query_id"),
        col("hits"), col("nq"))
    per.withColumn("recall", col("hits").cast("double") / k)
      .unionByName(overall
        .withColumn("recall",
          col("hits").cast("double") / (col("nq") * k))
        .drop("nq"))
  }

  /** recall@k per query and overall for both approximate methods. */
  def atK(spark: SparkSession, dir: String, k: Int = 10,
          queryMod: Int = 50): DataFrame = {
    val truth = Similarity.bruteForceTopK(spark, dir, k, queryMod)
      .select(col("query_id"), col("neighbor_id"))
    hitsOf(truth, Similarity.multiprobeTopK(spark, dir, k, queryMod),
      "multiprobe", k)
      .unionByName(hitsOf(truth, Ivf.topK(spark, dir, k, queryMod), "ivf", k))
  }

  /** recall@k of the PQ/ADC path ([[Pq.topK]]) — separate from [[atK]]
    * because PQ answers from 4-bit codes, a lossy representation whose
    * recall floor is a property of the compression, not the probe count.
    */
  def pqAtK(spark: SparkSession, dir: String, k: Int = 10,
            queryMod: Int = 50): DataFrame = {
    val truth = Similarity.bruteForceTopK(spark, dir, k, queryMod)
      .select(col("query_id"), col("neighbor_id"))
    hitsOf(truth, Pq.topK(spark, dir, k, queryMod), "pq", k)
      .unionByName(
        hitsOf(truth, Pq.rerankTopK(spark, dir, k, queryMod = queryMod),
          "pq_rerank", k))
      .unionByName(
        hitsOf(truth, Pq.ivfPqTopK(spark, dir, k, queryMod = queryMod),
          "ivfpq", k))
  }

  /** Matryoshka truncation recall (Kusupati et al., NeurIPS'22 — MRL;
    * public technique): recall@k of exact search over PREFIX-TRUNCATED
    * vectors against the full-dimension truth, per truncation width.
    * This is the measurement behind the modern embedding-serving trade
    * (store/search the first d dims, rerank with the full vector): it
    * quantifies how much neighborhood structure each prefix width
    * retains. On matryoshka-TRAINED embeddings the curve stays high;
    * on the isotropic fixture it decays toward d/dim — either way the
    * dial is measured, not assumed. Same per-query + overall output
    * shape as [[atK]]; cost is queries × corpus per width, bounded by
    * the measurement sample cap like every truth pass here.
    */
  def matryoshka(spark: SparkSession, dir: String, k: Int = 10,
                 queryMod: Int = 50,
                 dims: Seq[Int] = Seq(32, 16, 8)): DataFrame = {
    val truth = Similarity.bruteForceTopK(spark, dir, k, queryMod)
      .select(col("query_id"), col("neighbor_id"))
    dims.map(d => hitsOf(truth, truncTopK(spark, dir, d, k, queryMod),
        s"dim_$d", k))
      .reduce(_ unionByName _)
  }

  /** Exact top-k over the first `d` vector components, renormalized;
    * zero-prefix vectors are excluded on both sides (unrankable).
    */
  private def truncTopK(spark: SparkSession, dir: String, d: Int,
                        k: Int, queryMod: Int): DataFrame = {
    val dot2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val base = Similarity.normalized(spark, dir)
      .select(col("vec_id"), slice(col("v"), 1, d).as("vd"))
      .withColumn("nd", sqrt(dot2(col("vd"), col("vd"))))
      .filter(col("nd") > 0)
    val q = graft.Bcast.ifBounded(base.filter(AnnParams.queryPred(queryMod))
      .select(col("vec_id").as("query_id"), col("vd").as("qv"), col("nd").as("qn")),
      graft.Bcast.QueryBatch)
    val cos = (dot2(col("qv"), col("vd")) / (col("qn") * col("nd")))
      .grid6
    import org.apache.spark.sql.expressions.Window
    q.join(base, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cosine_sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine_sim").desc, col("neighbor_id"))))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id")
  }

  private def truncSql(d: Int, k: Int, queryMod: Int): String =
    s"""WITH ${Similarity.normCteAs("emb")}, embd AS (
       |  SELECT vec_id, v[1:$d] AS vd,
       |         sqrt(list_dot_product(v[1:$d], v[1:$d])) AS nd
       |  FROM emb
       |), q AS (
       |  SELECT vec_id AS query_id, vd AS qv, nd AS qn
       |  FROM embd WHERE ${AnnParams.queryPredSql(queryMod)} AND nd > 0
       |), pairs AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         floor((list_dot_product(q.qv, e.vd) / (q.qn * e.nd)) * 1e6 + 0.5) / 1e6 AS cosine_sim
       |  FROM q JOIN embd e ON e.vec_id != q.query_id AND e.nd > 0
       |)
       |SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rk
       |  FROM pairs
       |) WHERE rk <= $k""".stripMargin

  def matryoshkaSql(k: Int = 10, queryMod: Int = 50,
                    dims: Seq[Int] = Seq(32, 16, 8)): String = {
    val blocks = dims.map(d => block(s"dim_$d", truncSql(d, k, queryMod)))
      .mkString(",\n")
    val selects = dims.map { d =>
      s"""SELECT method, query_id, hits, CAST(hits AS DOUBLE) / $k AS recall
         |FROM per_dim_$d
         |UNION ALL
         |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / (nq * $k) AS recall
         |FROM all_dim_$d""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH truth AS (
       |  SELECT query_id, neighbor_id FROM (${Similarity.bruteForceSql(k, queryMod)})
       |), $blocks
       |$selects""".stripMargin
  }

  // ---------- DuckDB oracle ----------

  private def block(method: String, approxSql: String): String =
    s"""per_$method AS (
       |  SELECT '$method' AS method, q.query_id,
       |         COALESCE(h.hits, 0) AS hits
       |  FROM (SELECT DISTINCT query_id FROM truth) q
       |  LEFT JOIN (
       |    SELECT t.query_id, count(*) AS hits
       |    FROM truth t
       |    JOIN ($approxSql) a
       |      ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
       |    GROUP BY t.query_id
       |  ) h USING (query_id)
       |), all_$method AS (
       |  SELECT '$method' AS method, CAST(-1 AS BIGINT) AS query_id,
       |         CAST(SUM(hits) AS BIGINT) AS hits, count(*) AS nq
       |  FROM per_$method
       |)""".stripMargin

  /** Composes the three existing oracle queries (each a full WITH…SELECT,
    * legal as a parenthesized derived table in DuckDB) and mirrors the
    * hit-count/ratio arithmetic.
    */
  def atKSql(k: Int = 10, queryMod: Int = 50): String = {
    s"""WITH truth AS (
       |  SELECT query_id, neighbor_id FROM (${Similarity.bruteForceSql(k, queryMod)})
       |), ${block("multiprobe", Similarity.multiprobeSql(k, queryMod))},
       |${block("ivf", Ivf.topKSql(k, queryMod))}
       |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / $k AS recall
       |FROM per_multiprobe
       |UNION ALL
       |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / (nq * $k) AS recall
       |FROM all_multiprobe
       |UNION ALL
       |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / $k AS recall
       |FROM per_ivf
       |UNION ALL
       |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / (nq * $k) AS recall
       |FROM all_ivf""".stripMargin
  }

  def pqAtKSql(k: Int = 10, queryMod: Int = 50): String =
    s"""WITH truth AS (
       |  SELECT query_id, neighbor_id FROM (${Similarity.bruteForceSql(k, queryMod)})
       |), ${block("pq", Pq.topKSql(k, queryMod))},
       |${block("pq_rerank", Pq.rerankSql(k, queryMod = queryMod))},
       |${block("ivfpq", Pq.ivfPqSql(k, queryMod = queryMod))}
       |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / $k AS recall
       |FROM per_pq
       |UNION ALL
       |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / (nq * $k) AS recall
       |FROM all_pq
       |UNION ALL
       |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / $k AS recall
       |FROM per_pq_rerank
       |UNION ALL
       |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / (nq * $k) AS recall
       |FROM all_pq_rerank
       |UNION ALL
       |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / $k AS recall
       |FROM per_ivfpq
       |UNION ALL
       |SELECT method, query_id, hits, CAST(hits AS DOUBLE) / (nq * $k) AS recall
       |FROM all_ivfpq""".stripMargin
}
