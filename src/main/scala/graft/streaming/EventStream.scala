package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming path for the `events` stream: file source →
  * watermarked tumbling-window aggregation → sink. The reference is
  * batch-only (SURVEY.md §2.10), so this is the forward-looking streaming
  * twin of EventsOps.daily: the same (window, event_type) rollup computed
  * incrementally with late-data handling instead of a full rescan.
  *
  * Scale notes: state is bounded by the watermark (10 min late tolerance);
  * the aggregation state key space is (1h window × event_type) — tiny.
  * On a cluster the file source becomes Kafka with identical plan shape.
  */
object EventStream {

  /** The events schema as landed by the generator (ts arrives as
    * TIMESTAMP(NANOS) in parquet → read as long, converted below).
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Hourly per-type rollup over a streaming read of a parquet directory. */
  def hourlyCounts(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(schema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).cast("decimal(18,2)").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Run the stream into an in-memory table until all available input is
    * processed; returns the finished query (test/demo harness).
    */
  def runToMemory(spark: SparkSession, dir: String, tableName: String): StreamingQuery = {
    val q = hourlyCounts(spark, dir).writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q
  }
}
