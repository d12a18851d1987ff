package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII redaction — the scrubbing pass of a training-data pipeline:
  * replace email / phone / SSN-shaped spans with typed placeholder
  * tokens and count what was hit. A narrow codegen'd projection (chained
  * `regexp_replace`), so at 100 TB it streams through the text scan with
  * no shuffle at all.
  *
  * The patterns use only syntax Java regex and DuckDB's RE2 interpret
  * identically (char classes, `\d`, `\b`, bounded repeats) so the
  * registered query is digest-comparable across engines. The corpus here
  * contains no PII — the oracle proves transform parity (digests of the
  * redacted text), and RedactSpec proves the semantics on planted PII.
  */
object Redact {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** The scrub itself: SSN before phone (an SSN also matches no phone
    * pattern here, but keep the most specific pattern first as a rule).
    */
  def redacted(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "[EMAIL]"),
        ssnRe, "[ID]"),
      phoneRe, "[PHONE]")

  /** Registered query: per-doc hit counts + digest of the scrubbed text. */
  def scrub(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).as("n_emails"),
      regexp_count(col("text"), lit(phoneRe)).as("n_phones"),
      regexp_count(col("text"), lit(ssnRe)).as("n_ids"),
      md5(redacted(col("text"))).as("redacted_digest"))

  /** Per-source PII density — the audit table a compliance review reads
    * before a corpus ships: how many PII spans of each type each source
    * contributes, and how many of its documents carry any. Integer sums
    * of per-doc regex counts, so the aggregate is exact and
    * order-independent; scale shape is one narrow text scan + one
    * source-grain aggregate with map-side combine (sources are few).
    */
  def piiStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("source"),
      regexp_count(col("text"), lit(emailRe)).as("e"),
      regexp_count(col("text"), lit(phoneRe)).as("p"),
      regexp_count(col("text"), lit(ssnRe)).as("i"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("e").as("n_emails"),
        sum("p").as("n_phones"),
        sum("i").as("n_ids"),
        sum(when(col("e") + col("p") + col("i") > 0, 1L).otherwise(0L))
          .as("docs_with_pii"))

  // ---------- DuckDB oracle ----------

  // SQL single-quoted strings pass backslashes through untouched, so the
  // Scala pattern literals embed verbatim
  val scrubSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$emailRe')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS INT) AS n_phones,
       |  CAST(len(regexp_extract_all(text, '$ssnRe')) AS INT) AS n_ids,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |      '$emailRe', '[EMAIL]', 'g'),
       |      '$ssnRe', '[ID]', 'g'),
       |      '$phoneRe', '[PHONE]', 'g')) AS redacted_digest
       |FROM documents""".stripMargin

  val piiStatsSql: String =
    s"""WITH c AS (
       |  SELECT source,
       |    CAST(len(regexp_extract_all(text, '$emailRe')) AS INT) AS e,
       |    CAST(len(regexp_extract_all(text, '$phoneRe')) AS INT) AS p,
       |    CAST(len(regexp_extract_all(text, '$ssnRe')) AS INT) AS i
       |  FROM documents
       |)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(e) AS BIGINT) AS n_emails,
       |  CAST(SUM(p) AS BIGINT) AS n_phones,
       |  CAST(SUM(i) AS BIGINT) AS n_ids,
       |  CAST(SUM(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii
       |FROM c GROUP BY 1""".stripMargin
}
