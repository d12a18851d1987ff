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
}
