package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Main-content extraction from markup — the first operator of every
  * web-corpus pipeline (raw HTML → clean text), exercised with planted
  * truth: each document is deterministically wrapped in HTML boilerplate
  * (head/nav/footer + entity escaping), then the extractor strips it
  * back, and the report counts exact round-trips per source. A broken
  * tag pattern, greedy/lazy slip, or missed entity unescape diverges the
  * count — the same proof shape as the multimodal codec legs
  * (encode → decode → planted-truth compare).
  *
  * Scale: pure per-row column ops (concat/replace/regexp_extract inside
  * whole-stage codegen) + one source-grain aggregate; no shuffle beyond
  * the final rollup, no UDF.
  */
object Extract {

  /** Entity-escape the text payload (order matters: & first). */
  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  private def unesc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&lt;", "<"), "&gt;", ">"), "&amp;", "&")

  /** The planted wrap: nav + content div + footer, source-branded. */
  def wrapped(c: Column, source: Column, docId: Column): Column =
    concat(
      lit("<html><head><title>"), source, lit(" #"), docId,
      lit("</title></head><body><nav>home | about | "), source,
      lit("</nav><div class=\"content\"><p>"), esc(c),
      lit("</p></div><footer>(c) 2024 "), source,
      lit("</footer></body></html>"))

  /** The extractor under test: content element → unescape. `(?s)` so a
    * payload with newlines still matches across lines.
    */
  def extracted(html: Column): Column =
    unesc(regexp_extract(html, "(?s)<p>(.*)</p>", 1))

  /** Per-source round-trip report over the planted-wrapped corpus. */
  def htmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val html = wrapped(col("text"), col("source"), col("doc_id"))
    docs
      .select(col("source"), col("text"), html.as("html"))
      .withColumn("got", extracted(col("html")))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("got") === col("text"), 1)).as("n_roundtrip"),
        sum(length(col("html")) - length(col("text")))
          .as("markup_overhead_chars"))
  }

  val htmlRoundtripSql: String =
    """WITH wrapped AS (
      |  SELECT source, text,
      |         '<html><head><title>' || source || ' #' || doc_id ||
      |         '</title></head><body><nav>home | about | ' || source ||
      |         '</nav><div class="content"><p>' ||
      |         replace(replace(replace(text, '&', '&amp;'),
      |                         '<', '&lt;'), '>', '&gt;') ||
      |         '</p></div><footer>(c) 2024 ' || source ||
      |         '</footer></body></html>' AS html
      |  FROM documents
      |), got AS (
      |  SELECT source, text, html,
      |         replace(replace(replace(
      |             regexp_extract(html, '(?s)<p>(.*)</p>', 1),
      |           '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS got
      |  FROM wrapped
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |       COUNT(CASE WHEN got = text THEN 1 END) AS n_roundtrip,
      |       CAST(SUM(length(html) - length(text)) AS BIGINT)
      |         AS markup_overhead_chars
      |FROM got GROUP BY 1""".stripMargin
}
