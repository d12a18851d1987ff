package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Content-defined chunking (CDC) — the dedup-storage/rsync boundary
  * rule applied to text: a chunk ends wherever a rolling window hash
  * hits `0 mod divisor`, so boundaries are decided by CONTENT, not
  * offset. Insert one word at the front of a document and fixed-size
  * segmentation shifts every downstream segment (every fingerprint
  * changes); CDC boundaries realign after the edit window passes, so
  * shared runs between near-duplicate documents keep producing
  * identical chunk fingerprints. This is the segment-granularity
  * complement of [[SegmentDedup]] (fixed word windows) and the
  * interval-union substring dedup ([[SubstringDedup]]).
  *
  * Determinism: the boundary test is a salted md5 of the exact window
  * text (the house replayable-hash rule), so both engines cut at
  * identical positions; chunk assembly is pure array slicing — no
  * order-dependent accumulation anywhere.
  *
  * Scale shape: chunking is SHUFFLE-FREE — boundaries come from the
  * codegen'd [[graft.functions.CdcCutPositions]] kernel (one md5 per
  * word position in a tight loop) and chunk texts from array ops in
  * the same stage (never a corpus-wide word explode + window). The
  * only row-level shuffles are chunk-grain: one fingerprint count
  * (map-side combined) and the count join back, both hash-partitioned
  * on the fingerprint.
  */
object CdcChunk {

  /** Window of trailing words hashed for the boundary test. */
  val window = 4

  /** A chunk closes when the window hash is 0 mod this (expected chunk
    * length = divisor words).
    */
  val divisor = 16

  /** Per-document chunk table: (doc_id, source, chunk_idx, chunk_text,
    * fingerprint, n_words), derived entirely with array ops. Memoized:
    * [[report]] consumes it on both sides of the frequency join, and
    * the memo's lineage cut means the decode-and-chunk pass runs once.
    */
  def chunks(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "cdc_chunks", dir, "text_cdc_chunks") {
      chunksOf(Tables.documents(spark, dir))
    }

  /** [[chunks]] over any frame with (doc_id, source, text) — the spec
    * uses this to prove boundary realignment on a crafted edit.
    */
  def chunksOf(documents: DataFrame): DataFrame = {
    val w = window
    val docs = documents.select(
      col("doc_id"), col("source"),
      split(TextMetrics.normalized(col("text")), " ").as("ws"))
    // 1-based positions whose trailing-window hash closes a chunk; the
    // final position always closes the tail chunk. Native kernel: the
    // HOF formulation paid interpreted slice+md5 trees per position
    // (60 s at sf0.1 — see CdcCutPositions), this runs in codegen.
    val withCuts = docs.select(col("doc_id"), col("source"), col("ws"),
      graft.functions.CdcCutFunctions
        .cdcCuts(documents.sparkSession, col("ws"), w, divisor).as("cuts"))
    // chunk i spans (previous cut + 1) .. cut_i
    val withTexts = withCuts.select(col("doc_id"), col("source"),
      zip_with(col("cuts"),
        concat(array(lit(0)), slice(col("cuts"), lit(1), greatest(size(col("cuts")) - 1, lit(0)))),
        (end, prev) => concat_ws(" ",
          slice(col("ws"), prev + 1, end - prev))).as("texts"))
    withTexts
      .select(col("doc_id"), col("source"), posexplode(col("texts")).as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("source"), col("chunk_idx"), col("chunk_text"),
        md5(col("chunk_text")).as("fingerprint"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_words"))
  }

  /** Per-source CDC dedup card: chunk volume, mean chunk length (the
    * divisor-controlled knob), and the share of chunks whose fingerprint
    * recurs ANYWHERE in the corpus — the signal CDC exists to surface.
    */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val ch = chunks(spark, dir)
    val freq = ch.groupBy("fingerprint").agg(count(lit(1)).as("fp_cnt"))
    ch.join(freq, "fingerprint")
      .groupBy("source").agg(
        count(lit(1)).as("n_chunks"),
        countDistinct("fingerprint").as("distinct_fp"),
        sum("n_words").as("n_words"),
        sum(when(col("fp_cnt") > 1, 1L).otherwise(0L)).as("dup_chunks"))
      .select(col("source"), col("n_chunks"), col("distinct_fp"), col("n_words"),
        (col("n_words").cast("double") / col("n_chunks").cast("double"))
          .cast("decimal(18,6)").as("avg_chunk_words"),
        col("dup_chunks"),
        (col("dup_chunks").cast("double") / col("n_chunks").cast("double"))
          .cast("decimal(18,6)").as("dup_share"))
  }

  def reportSql: String = {
    val w = window
    s"""WITH ws_t AS (
       |  SELECT doc_id, source,
       |         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents
       |), cuts_t AS (
       |  SELECT doc_id, source, ws,
       |         list_filter(range(1, len(ws) + 1), p ->
       |           p = len(ws) OR
       |           CAST('0x' || substr(md5('cdc:' ||
       |             array_to_string(list_slice(ws, greatest(1, p - ${w - 1}), p), ' ')
       |           ), 1, 8) AS BIGINT) % $divisor = 0) AS cuts
       |  FROM ws_t
       |), chunk_t AS (
       |  SELECT doc_id, source,
       |         list_transform(cuts, (c, i) ->
       |           array_to_string(list_slice(ws,
       |             CASE WHEN i = 1 THEN 1 ELSE cuts[i - 1] + 1 END, c), ' ')) AS texts
       |  FROM cuts_t
       |), ch AS (
       |  SELECT doc_id, source, t.chunk_text,
       |         md5(t.chunk_text) AS fingerprint,
       |         CAST(len(string_split(t.chunk_text, ' ')) AS BIGINT) AS n_words
       |  FROM chunk_t, unnest(texts) AS t(chunk_text)
       |), freq AS (
       |  SELECT fingerprint, CAST(count(*) AS BIGINT) AS fp_cnt
       |  FROM ch GROUP BY 1
       |)
       |SELECT ch.source,
       |       CAST(count(*) AS BIGINT) AS n_chunks,
       |       CAST(count(DISTINCT ch.fingerprint) AS BIGINT) AS distinct_fp,
       |       CAST(sum(ch.n_words) AS BIGINT) AS n_words,
       |       CAST(CAST(CAST(sum(ch.n_words) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |         AS DECIMAL(18,6)) AS DOUBLE) AS avg_chunk_words,
       |       CAST(sum(CASE WHEN freq.fp_cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
       |       CAST(CAST(CAST(sum(CASE WHEN freq.fp_cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS dup_share
       |FROM ch JOIN freq USING (fingerprint)
       |GROUP BY 1""".stripMargin
  }
}
