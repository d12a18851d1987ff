package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus per-partition batched feature
  * extraction. The decode step is STUBBED (no image/audio codecs in this
  * environment) with a deterministic md5-derived fake — everything
  * Spark-side is real: the schema, the binary payload column, the
  * partition-batched iteration, and the fixed-width feature output that a
  * downstream ANN (graft.ops.Similarity) consumes.
  *
  * In production the [[features]] body is the only thing that changes:
  * the stub becomes a JNI/codec call (Scala) — or the operator moves to
  * `mapInPandas` with the identical schema contract when the codec lives
  * in Python. Batch shape (one partition = one decode batch) and the
  * 4-byte-bounded metadata stay as they are.
  */
object Multimodal {

  val featureDim = 16

  /** Media table: documents' text bytes stand in for an opaque media
    * payload; metadata columns are what a real ingest would carry.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3).cast("int") + 1).as("media_type"),
      // octet length of the BINARY payload, not character count of text
      length(encode(col("text"), "UTF-8")).as("payload_bytes"))

  /** Batched "decode + feature-extract": one fixed-width float vector per
    * payload. STUB — deterministic bytes-of-md5 features instead of a real
    * decoder; the mapPartitions batch shape is the real contract.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[(Long, Array[Byte])] = mediaTable(spark, dir)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
    media.mapPartitions { batch =>
      // one MessageDigest per partition — the "open the codec once per
      // batch" pattern a real decoder needs
      val md = MessageDigest.getInstance("MD5")
      batch.map { case (id, payload) =>
        val d = md.digest(payload)
        val vec = (0 until featureDim).map(i => (d(i) & 0xFF) / 255.0f).toArray
        (id, vec)
      }
    }.toDF("media_id", "feature_vec")
  }

  /** Resize: deterministic downsample of the payload to ≈`targetBytes`
    * by keeping every ceil(len/target)-th byte — the STUB body of an
    * image-resize; the real contract is the plumbing: binary in, smaller
    * binary + original/new dims out, pure column ops, no driver hop.
    */
  def resize(spark: SparkSession, dir: String, targetBytes: Int = 256): DataFrame = {
    val n = length(col("payload"))
    val stride = greatest(ceil(n.cast("double") / targetBytes).cast("int"), lit(1))
    mediaTable(spark, dir)
      .withColumn("resized",
        // sample byte positions 1, 1+stride, 1+2*stride, ... and re-join;
        // empty payloads short-circuit (sequence(1, 0) is an error, and
        // CaseWhen evaluates branches lazily per row)
        when(n === 0, lit(Array.emptyByteArray))
          .otherwise(aggregate(
            transform(sequence(lit(1), n, stride),
              i => substring(col("payload"), i, lit(1))),
            lit(Array.emptyByteArray),
            (acc, b) => concat(acc, b))))
      .select(col("media_id"), col("media_type"),
        col("payload_bytes").as("orig_bytes"),
        length(col("resized")).as("resized_bytes"),
        col("resized"))
  }

  /** Frame sampling: every `stride`-th fixed-size byte slice of the
    * payload (a video frame-sampler's plumbing; pure column ops).
    */
  def frameSample(spark: SparkSession, dir: String,
                  frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = floor(length(col("payload")) / (frameBytes * stride)).cast("int")
    mediaTable(spark, dir)
      .select(col("media_id"), col("payload"), nFrames.as("n"))
      .filter(col("n") > 0)
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), col("n") - 1),
          i => substring(col("payload"), (i * frameBytes * stride) + 1, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
  }

  // ---------- driver-check projections + DuckDB oracles ----------
  //
  // The BINARY payload / ARRAY feature columns themselves can't round-trip
  // the driver's hash compare (pandas can't sort array cells; binary
  // doesn't hash), so the REGISTERED queries project md5 digests + byte
  // counts instead — full-strength content checks over scalar columns.
  // The oracles recompute the digests from `documents.text` in DuckDB;
  // this corpus is pure ASCII (length == octet_length for every row at
  // every SF), so DuckDB character slicing equals Spark byte slicing.

  /** [[mediaTable]] with the payload projected to its md5 digest. */
  def mediaCheck(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("media_id"), md5(col("payload")).as("payload_md5"),
      col("media_type"), col("payload_bytes"))

  private val mediaTypeSql =
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END"

  val mediaCheckSql: String =
    s"""SELECT doc_id AS media_id, md5(text) AS payload_md5,
       |       $mediaTypeSql AS media_type,
       |       CAST(length(text) AS INT) AS payload_bytes
       |FROM documents""".stripMargin

  /** [[features]] exploded to one scalar row per vector dimension; the
    * float is mapped back to the exact md5 byte it was derived from, so
    * the oracle is an integer compare (no float-vs-double noise).
    */
  def featuresCheck(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .select(col("media_id"), posexplode(col("feature_vec")))
      .select(col("media_id"), col("pos").cast("int").as("dim_idx"),
        round(col("col").cast("double") * 255.0).cast("int").as("byte_val"))

  val featuresCheckSql: String =
    s"""SELECT doc_id AS media_id, CAST(t.i AS INT) AS dim_idx,
       |       CAST(('0x' || substr(md5(text), 2 * CAST(t.i AS INT) + 1, 2))::BIGINT AS INT) AS byte_val
       |FROM documents, range(0, $featureDim) t(i)""".stripMargin

  /** [[resize]] with the resized payload projected to its md5 digest. */
  def resizeCheck(spark: SparkSession, dir: String): DataFrame =
    resize(spark, dir).select(
      col("media_id"), col("media_type"), col("orig_bytes"),
      col("resized_bytes"), md5(col("resized")).as("resized_md5"))

  /** Strided-sample twin of [[resize]] (targetBytes = 256): positions
    * 1, 1+stride, … via a bounded range cross-join (this DuckDB build has
    * no lateral generate_series).
    */
  val resizeCheckSql: String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, $mediaTypeSql AS media_type, text,
       |         CAST(length(text) AS INT) AS n,
       |         GREATEST(CAST(CEIL(CAST(length(text) AS DOUBLE) / 256.0) AS INT), 1) AS stride
       |  FROM documents
       |), sampled AS (
       |  SELECT m.media_id, m.media_type, m.n,
       |         string_agg(substr(m.text, CAST(p.p AS INT), 1), '' ORDER BY p.p) AS resized
       |  FROM m JOIN range(1, 8192) p(p)
       |    ON p.p <= m.n AND (p.p - 1) % m.stride = 0
       |  GROUP BY 1, 2, 3
       |)
       |SELECT media_id, media_type, n AS orig_bytes,
       |       CAST(length(resized) AS INT) AS resized_bytes,
       |       md5(resized) AS resized_md5
       |FROM sampled""".stripMargin

  /** [[frameSample]] with each frame projected to its md5 digest. */
  def framesCheck(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, dir).select(
      col("media_id"), col("frame_idx"), md5(col("frame")).as("frame_md5"))

  /** frameBytes = 64, stride = 4 → one full 64-byte frame per 256 bytes;
    * `f < floor(len/256)` guarantees every frame is full-width.
    */
  val framesCheckSql: String =
    """SELECT doc_id AS media_id, CAST(t.f AS INT) AS frame_idx,
      |       md5(substr(text, CAST(t.f AS INT) * 256 + 1, 64)) AS frame_md5
      |FROM documents, range(0, 64) t(f)
      |WHERE t.f < CAST(floor(length(text) / 256.0) AS INT)""".stripMargin
}
