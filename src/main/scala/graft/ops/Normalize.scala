package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.NfcFunctions

/** Unicode canonicalization pass — the transform that runs BEFORE every
  * fingerprint/shingle/token operator in a real ingest, because crawled
  * text encodes the same glyph in multiple byte sequences and exact-match
  * dedup fractures until the corpus is on one canonical form (NFC, UAX
  * #15).
  *
  * The synthetic corpus is pure ASCII (reference has no unicode leg), so
  * the query plants its own non-ASCII evidence the same way the
  * multimodal and PII legs do: a deterministic subset of documents gets a
  * DECOMPOSED suffix (base letter + combining acute, U+0301), a disjoint
  * subset gets the PRECOMPOSED form (U+00E9) that NFC must leave alone,
  * and the rest stay ASCII to exercise the identity fast path. The
  * engine normalizes with the codegen'd [[graft.functions.NfcNormalize]]
  * expression; DuckDB replays with its native `nfc_normalize`, so
  * composition behavior, char counts, and the final cleaned digest are
  * all verified cross-engine per document.
  *
  * Scale: one narrow projection over the text column — no shuffle, no
  * UDF, stays inside whole-stage codegen; the ASCII fast path means the
  * normalizer allocates nothing on the (dominant) ASCII fraction of a
  * real crawl.
  */
object Normalize {

  /** Decomposed evidence: "cafe" + combining acute ×2 — NFC shortens it
    * by exactly the two combining marks it composes away.
    */
  private val decomposed = " cafe\u0301 touche\u0301"
  private val precomposed = " caf\u00e9"

  def report(spark: SparkSession, dir: String): DataFrame = {
    val messy = Tables.documents(spark, dir).withColumn("t",
      when(col("doc_id") % 3 === 0, concat(col("text"), lit(decomposed)))
        .when(col("doc_id") % 5 === 0, concat(col("text"), lit(precomposed)))
        .otherwise(col("text")))
    val norm = messy.withColumn("n", NfcFunctions.nfcNormalize(spark, col("t")))
    norm.select(
      col("doc_id"), col("source"),
      (col("t") =!= col("n")).as("changed"),
      length(col("t")).cast("long").as("n_raw"),
      length(col("n")).cast("long").as("n_norm"),
      // the canonical cleaned form downstream fingerprints would consume:
      // NFC, collapsed whitespace, trimmed
      md5(trim(regexp_replace(col("n"), "\\s+", " "))).as("digest"))
  }

  /** Oracle: DuckDB's native `nfc_normalize` over the identically
    * planted fixture.
    */
  def reportSql: String =
    """WITH messy AS (
      |  SELECT doc_id, source,
      |         CASE WHEN doc_id % 3 = 0
      |                THEN text || ' cafe' || chr(769) || ' touche' || chr(769)
      |              WHEN doc_id % 5 = 0 THEN text || ' caf' || chr(233)
      |              ELSE text END AS t
      |  FROM documents
      |), norm AS (
      |  SELECT doc_id, source, t, nfc_normalize(t) AS n FROM messy
      |)
      |SELECT doc_id, source, t <> n AS changed,
      |       CAST(length(t) AS BIGINT) AS n_raw,
      |       CAST(length(n) AS BIGINT) AS n_norm,
      |       md5(trim(regexp_replace(n, '\s+', ' ', 'g'))) AS digest
      |FROM norm""".stripMargin
}
