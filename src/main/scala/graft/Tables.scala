package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver testdata layout
  * (`/root/testdata/sf<sf>/<name>.parquet`, see TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's parquet source
  * handles column pruning and predicate pushdown; callers must select/filter
  * declaratively (never `.collect` then filter) so the pushdown reaches the
  * scan. At cluster scale the same call works unchanged against a
  * directory of many files — Spark parallelizes by row-group/file split
  * (`spark.sql.files.maxPartitionBytes`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** The generator has landed `events.parquet` with two `ts` encodings
    * across data drops: TIMESTAMP(NANOS) — which Spark's parquet reader
    * rejects by default, so it is read as a nanos long under
    * `spark.sql.legacy.parquet.nanosAsLong` and truncated to micros (the
    * same truncation DuckDB applies pulling nanos into its
    * micros-precision TIMESTAMP) — and plain TIMESTAMP(MICROS), which
    * infers as TIMESTAMP_NTZ and only needs the session-zone cast (UTC
    * everywhere, so the instant is unchanged). [[normalizeEventTs]]
    * dispatches on the footer schema; both vintages come out as an
    * identical micros TIMESTAMP column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(apply(spark, dir, "events"))
  }

  /** Normalize an events frame's `ts` to a micros TIMESTAMP whatever the
    * stored encoding (shared with the streaming readers, which face the
    * same two vintages).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      // NB: integer DIV, not `/` — long/long is double division in Spark
      // and nanos (~1.7e18) exceed double's 53-bit mantissa.
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // cast NTZ→instant is zone-sensitive; every entrypoint pins UTC,
        // assert rather than silently reinterpret under a stray zone
        val zone = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(zone == "UTC",
          s"NTZ ts normalization requires spark.sql.session.timeZone=UTC, got $zone")
        df.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType    => df
      case other            => sys.error(
        s"events.ts has unsupported type $other — expected TIMESTAMP, " +
          "TIMESTAMP_NTZ, or INT64 nanos; add an explicit normalization " +
          "branch rather than letting it flow through unnormalized")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
