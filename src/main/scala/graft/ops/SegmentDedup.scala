package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segment-level corpus deduplication — the CCNet/RefinedWeb "line
  * dedup" stage: hash every segment of every document corpus-wide, keep
  * only the FIRST occurrence of each distinct segment (ordered by
  * (doc_id, position)), drop every later repeat, and reassemble each
  * document from its surviving segments in order.
  *
  * CCNet segments on newline; the synthetic `documents` fixture is
  * single-line, so the segmenter here is the pipeline's existing
  * fixed-word chunker ([[TextPrep.chunks]] with zero overlap) — swapping
  * in `split(text, "\n")` is a one-column change and every downstream
  * step (hash → first-occurrence rank → reassembly) is segmenter-blind.
  *
  * Scale shape: one narrow chunking pass; one shuffle keyed by segment
  * hash for the first-occurrence rank (the window is per-hash, and hash
  * groups are tiny — duplicate cardinality — so no skew); one shuffle
  * back to doc_id for reassembly. No driver state, no all-pairs step:
  * cost is O(corpus segments), exactly how CCNet runs at web scale.
  */
object SegmentDedup {

  /** Per-document dedup report: segment counts plus an md5 digest of the
    * reassembled cleaned text (the digest keeps the registered query
    * scalar; the cleaned text itself is the `clean_text` column feeding
    * it, selectable by callers that want the payload).
    */
  def report(spark: SparkSession, dir: String, segWords: Int = 16): DataFrame = {
    val segs = TextPrep.chunks(spark, dir, chunkWords = segWords, overlap = 0)
      .withColumn("h", md5(col("chunk_text")))
    val marked = segs.withColumn("rk",
      row_number().over(Window.partitionBy("h").orderBy("doc_id", "chunk_idx")))
    val per = marked.groupBy("doc_id").agg(
      count(lit(1)).as("total_segments"),
      sum(when(col("rk") === 1, 1L).otherwise(0L)).as("kept_segments"))
    val cleaned = marked.filter(col("rk") === 1)
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          x => x.getField("chunk_text"))).as("clean_text"))
    per.join(cleaned, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("total_segments"),
        col("kept_segments"),
        (col("total_segments") - col("kept_segments")).as("dropped_segments"),
        md5(coalesce(col("clean_text"), lit(""))).as("clean_md5"),
        coalesce(size(split(col("clean_text"), " ")), lit(0))
          .cast("int").as("clean_words"))
  }

  def reportSql(segWords: Int = 16): String =
    s"""WITH ch AS (
       |  ${TextPrep.chunksSql(chunkWords = segWords, overlap = 0).replace("\n", "\n  ")}
       |), r AS (
       |  SELECT doc_id, chunk_idx, chunk_text,
       |         row_number() OVER (PARTITION BY md5(chunk_text)
       |                            ORDER BY doc_id, chunk_idx) AS rk
       |  FROM ch
       |), per AS (
       |  SELECT doc_id,
       |         CAST(count(*) AS BIGINT) AS total_segments,
       |         CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_segments
       |  FROM r GROUP BY 1
       |), cl AS (
       |  SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS clean_text
       |  FROM r WHERE rk = 1 GROUP BY 1
       |)
       |SELECT per.doc_id, per.total_segments, per.kept_segments,
       |       per.total_segments - per.kept_segments AS dropped_segments,
       |       md5(COALESCE(cl.clean_text, '')) AS clean_md5,
       |       CAST(COALESCE(len(string_split(cl.clean_text, ' ')), 0) AS INT) AS clean_words
       |FROM per LEFT JOIN cl USING (doc_id)""".stripMargin
}
