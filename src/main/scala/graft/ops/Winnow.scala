package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Winnowing-fingerprint dedup over `documents` — the rolling-hash
  * counterpart to MinHash: shared substrings ≥ k+w−1 chars guarantee
  * shared fingerprints, so containment of fingerprint sets detects
  * near-dup / partial-overlap documents (plagiarism-detector semantics).
  *
  * Scale shape: fingerprints per doc ≈ 2·len/w (sub-linear in w); the
  * pair generation is an equi-join on individual fingerprint values —
  * bounded by posting-list sizes like the LSH band join, never all-pairs.
  */
object Winnow {

  /** (doc_id, fingerprints array<long>) via the custom expression. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "winnow_fingerprints", dir) {
      Tables.documents(spark, dir).select(
        col("doc_id"),
        GraftFunctions.winnowFingerprint(spark,
          TextMetrics.normalized(col("text"))).as("fingerprints"))
    }

  /** Driver-check projection of [[fingerprints]]: the raw `array<long>`
    * crashes the comparator's pandas sort, so the registered query emits
    * per-doc scalars — count + md5 over the sorted fingerprint list. No
    * DuckDB oracle (the mod-2⁶⁴ polynomial rolling hash has no ANSI-SQL
    * twin — BIGINT overflow is an error there, not a wrap); the driver
    * records a rows-only check and WinnowPropertySpec carries the
    * algorithmic guarantees.
    */
  def fingerprintsCheck(spark: SparkSession, dir: String): DataFrame =
    fingerprints(spark, dir).select(
      col("doc_id"),
      size(col("fingerprints")).as("n_fingerprints"),
      md5(concat_ws(",", transform(col("fingerprints"), _.cast("string"))))
        .as("fp_digest"))

  /** Candidate pairs by shared-fingerprint containment ≥ `threshold`
    * (containment = |A∩B| / min(|A|,|B|)).
    */
  def nearDups(spark: SparkSession, dir: String,
               threshold: Double = 0.5, maxDocFreq: Int = 50): DataFrame = {
    val fp = fingerprints(spark, dir)
      .select(col("doc_id"), col("fingerprints"),
        size(col("fingerprints")).as("n"))
    val postingAll = fp.select(col("doc_id"), col("n"),
      explode(col("fingerprints")).as("f"))
    // Posting-list pruning: a fingerprint present in d docs yields d² pair
    // rows, so stop-fingerprints (common phrases) make the join
    // quasi-cartesian while carrying no near-dup signal. Cap doc-freq.
    val rare = postingAll.groupBy("f")
      .agg(count(lit(1)).as("df")).filter(col("df") <= maxDocFreq)
      .select("f")
    val posting = postingAll.join(rare, Seq("f"))
    val a = posting.select(col("f"), col("doc_id").as("doc_a"), col("n").as("na"))
    val b = posting.select(col("f"), col("doc_id").as("doc_b"), col("n").as("nb"))
    a.join(b, Seq("f"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("shared"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") / least(col("na"), col("nb")).cast("double"))
          .cast("decimal(10,6)").as("containment"))
      .filter(col("containment") >= threshold)
  }
}
