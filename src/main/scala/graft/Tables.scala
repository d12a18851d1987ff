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
  /** `events.parquet` stores `ts` as TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects by default. Read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to micros —
    * the same truncation DuckDB applies when it reads nanos into its
    * micros-precision TIMESTAMP, so results stay oracle-comparable.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NB: integer DIV, not `/` — long/long is double division in Spark and
    // nanos (~1.7e18) exceed double's 53-bit mantissa.
    apply(spark, dir, "events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
