package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Global sequence packing: concatenate the whole corpus token stream in
  * doc_id order and cut it into fixed-length training sequences that
  * cross document boundaries — the pretraining "concat-and-chunk" step.
  *
  * Differs from [[TextPrep.shards]] (per-source grouping, where the
  * window partition key keeps the running sum parallel): packing needs
  * ONE global total order, and a naive `Window.orderBy(doc_id)` would
  * funnel the entire corpus through a single task. Instead the global
  * running offset is a two-tier prefix sum:
  *
  *  - tier 1: docs are bucketed by `doc_id div bucketSize` (a
  *    data-deterministic, order-aligned key — unlike
  *    `spark_partition_id`, it cannot shift between jobs), bucket token
  *    totals are aggregated (map-side combine, ≤ n/bucketSize rows) and
  *    cumulated with a window over that metadata-scale frame only;
  *  - tier 2: a window PARTITIONED by bucket computes the within-bucket
  *    running sum in parallel, and a broadcast join adds the bucket
  *    offset.
  *
  * At 100 TB: tier-1 frame is ~n/bucketSize rows (tune bucketSize so
  * that stays ~10^5–10^6; cumulating it is metadata work, and can be
  * tiered again if n outgrows one level); tier-2 window groups are
  * ≤ bucketSize docs each. No full-corpus single-partition stage exists.
  */
object Pack {

  val seqLen     = 256
  val bucketSize = 100L

  /** Tokens per doc, counted exactly as [[TextPrep.chunks]] tokenizes
    * (whitespace-split of the normalized text).
    */
  private def docTokens: Column =
    size(split(TextMetrics.normalized(col("text")), " ")).cast("long")

  /** Per-doc global token offsets: (doc_id, doc_tokens, tok_start) where
    * tok_start is the exclusive prefix sum of doc_tokens in doc_id order.
    */
  def assignments(spark: SparkSession, dir: String): DataFrame =
    assignmentsFrom(Tables.documents(spark, dir))

  /** [[assignments]] over an arbitrary (doc_id, text, …) frame — the
    * curation DAG packs the CLEANED corpus it just reloaded, not the
    * raw table.
    */
  def assignmentsFrom(docsIn: DataFrame): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), docTokens.as("doc_tokens"))
      .filter(col("doc_tokens") > 0)
      .withColumn("bucket", expr(s"doc_id div $bucketSize"))
    // tier 1: bucket totals → exclusive cumulative offsets. The window
    // runs over the aggregated frame only (n/bucketSize rows).
    val offsets = docs.groupBy("bucket").agg(sum("doc_tokens").as("bt"))
      .withColumn("bucket_offset",
        coalesce(sum("bt").over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("bt")
    // tier 2: within-bucket exclusive running sum, parallel across buckets.
    val wb = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.join(Bcast.ifBounded(offsets, Bcast.Partitions), "bucket")
      .withColumn("tok_start",
        col("bucket_offset") + coalesce(sum("doc_tokens").over(wb), lit(0L)))
      .select("doc_id", "doc_tokens", "tok_start")
  }

  /** Per-sequence rollup of the packed stream: how many docs land in each
    * fixed-length sequence, its filled token count (== seqLen everywhere
    * but the tail), and the doc_id span it covers. `div` (not `/`) keeps
    * the arithmetic in exact integer space at any corpus size.
    */
  def pack(spark: SparkSession, dir: String): DataFrame =
    packOf(assignments(spark, dir))

  /** The per-sequence rollup from an (doc_id, doc_tokens, tok_start)
    * assignment frame — split out so the curation DAG can roll up the
    * assignment file it RELOADED.
    */
  def packOf(asg: DataFrame): DataFrame =
    asg
      .withColumn("seq_id",
        explode(sequence(
          expr(s"tok_start div $seqLen"),
          expr(s"(tok_start + doc_tokens - 1) div $seqLen"))))
      .withColumn("tok_in_seq",
        least(col("tok_start") + col("doc_tokens"), (col("seq_id") + 1) * seqLen)
          - greatest(col("tok_start"), col("seq_id") * seqLen))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok_in_seq").as("seq_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))

  /** Inference-batching efficiency: bucket documents by
    * next-power-of-two token length and report, per bucket, how many
    * batches of [[batchSize]] they fill and how much padding the bucket
    * cap costs — the table that justifies length-bucketed batching over
    * naive padding-to-max. The power-of-two cap is computed with exact
    * integer bit arithmetic (`length(bin(n−1))`, the same
    * engine-portable ⌈log₂⌉ trick as [[AnnParams.ceilLog2]]'s SQL twin)
    * — no floating log whose ulp could straddle a boundary. One narrow
    * scan + one ≤⌈log₂(max_len)⌉-group aggregate; scan-bound at any
    * corpus size.
    */
  val batchSize = 32

  def paddingStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), docTokens.as("toks"))
      .filter(col("toks") > 0)
      .withColumn("bucket_len",
        when(col("toks") <= 1, 1L)
          .otherwise(expr("CAST(shiftleft(CAST(1 AS BIGINT), length(bin(toks - 1))) AS BIGINT)")))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("total_tokens"))
      .select(col("bucket_len"), col("n_docs"), col("total_tokens"),
        expr(s"(n_docs + ${batchSize - 1}) div $batchSize").as("n_batches"),
        (col("n_docs") * col("bucket_len") - col("total_tokens")).as("pad_tokens"),
        ((col("n_docs") * col("bucket_len") - col("total_tokens")).cast("double") /
          (col("n_docs") * col("bucket_len"))).as("pad_frac"))

  val paddingStatsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT) AS toks
       |  FROM documents
       |), b AS (
       |  SELECT CASE WHEN toks <= 1 THEN 1
       |              ELSE (CAST(1 AS BIGINT) << length(bin(toks - 1))) END AS bucket_len,
       |         toks
       |  FROM toks WHERE toks > 0
       |)
       |SELECT bucket_len,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(toks) AS BIGINT) AS total_tokens,
       |  CAST((COUNT(*) + ${batchSize - 1}) // $batchSize AS BIGINT) AS n_batches,
       |  CAST(COUNT(*) * bucket_len - SUM(toks) AS BIGINT) AS pad_tokens,
       |  CAST(COUNT(*) * bucket_len - SUM(toks) AS DOUBLE)
       |    / (COUNT(*) * bucket_len) AS pad_frac
       |FROM b GROUP BY 1""".stripMargin

  /** Oracle twin of [[assignments]] — the per-doc mapping is itself the
    * artifact a shard writer consumes, so it is driver-checked directly.
    */
  val assignmentsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT) AS doc_tokens
       |  FROM documents
       |)
       |SELECT doc_id, doc_tokens,
       |       CAST(COALESCE(SUM(doc_tokens) OVER (
       |         ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
       |FROM toks WHERE doc_tokens > 0""".stripMargin

  val packSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT) AS doc_tokens
       |  FROM documents
       |), pos AS (
       |  SELECT doc_id, doc_tokens,
       |         CAST(COALESCE(SUM(doc_tokens) OVER (
       |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
       |  FROM toks WHERE doc_tokens > 0
       |), spans AS (
       |  SELECT doc_id, doc_tokens, tok_start,
       |         unnest(generate_series(tok_start // $seqLen,
       |                                (tok_start + doc_tokens - 1) // $seqLen)) AS seq_id
       |  FROM pos
       |)
       |SELECT seq_id, COUNT(*) AS n_docs,
       |       CAST(SUM(LEAST(tok_start + doc_tokens, (seq_id + 1) * $seqLen)
       |              - GREATEST(tok_start, seq_id * $seqLen)) AS BIGINT) AS seq_tokens,
       |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM spans GROUP BY seq_id""".stripMargin

  /** NO-SPLIT sequence packing — the SFT/instruction-tuning variant of
    * [[pack]]: a document must land whole in one training sequence
    * (attention must not bleed across unrelated documents), so instead of
    * concat-and-chunk the packer assigns whole docs to fixed-capacity
    * bins and pays the padding.
    *
    * The algorithm is shelf packing (the classic Harmonic family —
    * public technique, e.g. Lee & Lee, JACM'85): docs are classed by
    * next-power-of-two length bucket, and a bucket whose cap is `c`
    * packs `k_fit = seqLen div c` docs per bin — guaranteed to fit, no
    * per-bin running sum needed, so bin assignment is a closed-form
    * `(rank − 1) div k_fit` over a rank window. Sequential first-fit
    * would pack slightly tighter but is an inherently serial fold; the
    * shelf rule is what actually distributes, and its waste is REPORTED,
    * not hidden.
    *
    * Distribution is honest two-level: the rank window partitions by
    * (bucket, shard) with shard = `doc_id div bucketSize` — bounded
    * partitions that parallelize like [[assignmentsFrom]]'s tier 2; each
    * shard fills its own bins (at most one partial bin per (bucket,
    * shard) group — exactly the trade a real distributed packer makes,
    * and the tail bins' waste shows up in the output). Docs longer than
    * [[seqLen]] cannot pack; they become dedicated oversize bins
    * (truncation is downstream's decision) with waste 0.
    */
  def bins(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), docTokens.as("toks"))
      .filter(col("toks") > 0)
      .withColumn("bucket_len",
        when(col("toks") <= 1, 1L)
          .otherwise(expr("CAST(shiftleft(CAST(1 AS BIGINT), length(bin(toks - 1))) AS BIGINT)")))
      .withColumn("shard", expr(s"doc_id div $bucketSize"))
      .withColumn("k_fit", expr(s"greatest(CAST(1 AS BIGINT), $seqLen div bucket_len)"))
    val rank = row_number().over(
      Window.partitionBy("bucket_len", "shard")
        .orderBy(col("toks").desc, col("doc_id")))
    docs.withColumn("r", rank)
      .withColumn("bin_id", expr("(r - 1) div k_fit"))
      .groupBy("bucket_len", "shard", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("bin_tokens"))
      .withColumn("oversize", col("bucket_len") > seqLen)
      .withColumn("waste",
        when(col("oversize"), 0L).otherwise(lit(seqLen.toLong) - col("bin_tokens")))
  }

  val binsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT) AS toks
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, toks,
       |         CASE WHEN toks <= 1 THEN 1
       |              ELSE (CAST(1 AS BIGINT) << length(bin(toks - 1))) END AS bucket_len,
       |         doc_id // $bucketSize AS shard
       |  FROM toks WHERE toks > 0
       |), ranked AS (
       |  SELECT *, GREATEST(1, $seqLen // bucket_len) AS k_fit,
       |         row_number() OVER (PARTITION BY bucket_len, shard
       |                            ORDER BY toks DESC, doc_id) AS r
       |  FROM b
       |)
       |SELECT bucket_len, shard, (r - 1) // k_fit AS bin_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(toks) AS BIGINT) AS bin_tokens,
       |       bucket_len > $seqLen AS oversize,
       |       CAST(CASE WHEN bucket_len > $seqLen THEN 0
       |            ELSE $seqLen - SUM(toks) END AS BIGINT) AS waste
       |FROM ranked GROUP BY 1, 2, 3
       |""".stripMargin
}
