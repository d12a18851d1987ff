package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Token-budget curriculum selection: give each source a token budget
  * (its weight × its token mass) and fill it with that source's
  * highest-quality documents — the curation step that turns a weighted
  * mixture into an actual training set under a token budget. Where
  * [[Sampling.mixture]] keeps a hash-uniform `rate` fraction of DOCS,
  * this keeps the best-first `rate` fraction of TOKENS.
  *
  * Scale shape: everything is windowed BY SOURCE (rank and running sum
  * are parallel across sources); budgets are a sources-sized aggregate
  * broadcast back. The within-source sort by quality is the honest cost
  * of exact ranking — for a skewed mega-source, pre-bucket by a quality
  * quantile (computed via approx_percentile) exactly as [[Pack]] tiers
  * its prefix sum, so no single task sorts the whole source.
  */
object Curriculum {

  /** Integer weight (numerator out of 10) per source tier — the same
    * tiers as [[Sampling.mixRate]] (1.0 / 0.5 / 0.2), kept integral so
    * budgets are exact integer arithmetic in both engines.
    */
  private def weightNum: Column =
    when(expr("CAST(substring(source, 4) AS INT)") < 5, 10L)
      .when(expr("CAST(substring(source, 4) AS INT)") < 10, 5L)
      .otherwise(2L)

  /** Selected docs: per source, rank by (quality desc, doc_id) and keep
    * while the exclusive running token sum is under the source budget —
    * the doc crossing the boundary is kept, so each budget is reached.
    * Output: one row per kept doc with its rank and inclusive cum sum.
    */
  def select(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(TextMetrics.normalized(col("text")), " ")).cast("long")
          .as("doc_tokens"),
        TextMetrics.qualityScore.as("q"),
        weightNum.as("wn"))
    val budgets = docs.groupBy("source")
      .agg((sum("doc_tokens") * first("wn")).as("wtoks"))
      .select(col("source"), expr("wtoks div 10").as("budget"))
    val w = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id"))
    docs
      .withColumn("sel_rank", row_number().over(w))
      .withColumn("cum_before",
        coalesce(sum("doc_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .join(Bcast.ifBounded(budgets, Bcast.Domain), "source")
      .filter(col("cum_before") < col("budget"))
      .select(col("doc_id"), col("source"), col("sel_rank"),
        col("doc_tokens"), (col("cum_before") + col("doc_tokens")).as("cum_tokens"),
        col("budget"))
  }

  val selectSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS BIGINT) AS doc_tokens,
      |    LEAST(1.0, CAST(length(text) AS DOUBLE) / 500.0) * 0.4
      |      + COALESCE(CAST(len(list_distinct(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))) AS DOUBLE)
      |                 / NULLIF(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 0), 0) * 0.4
      |      + COALESCE(CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|that)\b')) AS DOUBLE)
      |                 / NULLIF(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 0), 0) * 0.2 AS q,
      |    CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 10
      |         WHEN CAST(substr(source, 4) AS INT) < 10 THEN 5 ELSE 2 END AS wn
      |  FROM documents
      |), b AS (
      |  SELECT source, CAST(SUM(doc_tokens) AS BIGINT) * MIN(wn) // 10 AS budget
      |  FROM d GROUP BY source
      |), r AS (
      |  SELECT doc_id, source, doc_tokens,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS sel_rank,
      |    CAST(COALESCE(SUM(doc_tokens) OVER (PARTITION BY source ORDER BY q DESC, doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      |  FROM d
      |)
      |SELECT r.doc_id, r.source, CAST(r.sel_rank AS INT) AS sel_rank,
      |       r.doc_tokens, r.cum_before + r.doc_tokens AS cum_tokens, b.budget
      |FROM r JOIN b USING (source)
      |WHERE r.cum_before < b.budget""".stripMargin
}
