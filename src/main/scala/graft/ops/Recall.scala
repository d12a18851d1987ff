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
