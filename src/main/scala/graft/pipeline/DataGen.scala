package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1–S3 — the reference's synthetic dataset generator
  * (`/root/reference/data-pipeline/src/get_dataset.py:6-73`) as seeded
  * Spark-native column expressions over `spark.range(n)`: 100 users / 5
  * categories / 5 regions / 3 statuses, normal salary, gamma-ish
  * purchase amounts, SCD2 validity windows, the five anomaly classes at
  * the reference's rates (5% negative salary, 3% null age, 4% inverted
  * dates, 2% 1000× outliers, 3% invalid category) and 2% duplicate rows.
  *
  * NumPy RNG streams cannot be reproduced inside Spark (SURVEY.md §7.5):
  * with a fixed `seed` the output is deterministic run-to-run, and the
  * distributions match the reference statistically, not row-for-row. The
  * pipeline's correctness gate therefore runs on the driver-provided
  * testdata (Bronze); DataGen exists as the generator *operator* —
  * `spark.range` parallelizes it across the cluster with no driver
  * materialization, so n scales to billions.
  */
object DataGen {

  val categories: Seq[String] =
    Seq("Electronics", "Clothing", "Books", "Home", "Sports")
  val regions: Seq[String] = Seq("North", "South", "East", "West", "Central")
  val statuses: Seq[String] = Seq("active", "inactive", "pending")

  private def pick(options: Seq[String], r: org.apache.spark.sql.Column) =
    element_at(array(options.map(lit): _*),
      (r * options.size).cast("int") + 1)

  def users(spark: SparkSession, n: Long, seed: Long = 42): DataFrame = {
    val df = spark.range(n).toDF("id")
      .withColumn("u", rand(seed))          // categorical picks
      .withColumn("g", randn(seed + 1))     // salary normal
      .withColumn("p1", rand(seed + 2))     // purchase gamma-ish
      .withColumn("p2", rand(seed + 3))
      .withColumn("a", rand(seed + 4))      // anomaly rolls
      .withColumn("d", rand(seed + 5))      // date offsets

    val userNum = (col("u") * 100).cast("int")
    df.select(
      col("id"),
      concat(lit("user_"), lpad(userNum.cast("string"), 4, "0")).as("user_id"),
      concat(lit("User "), lpad(userNum.cast("string"), 4, "0")).as("user_name"),
      // null-age anomaly: 3%
      when(col("a") < 0.03, lit(null).cast("int"))
        .otherwise((col("u") * 82 + 18).cast("int")).as("age"),
      // normal(75000, 25000), 5% negated
      when(col("a") >= 0.03 && col("a") < 0.08,
        -abs(col("g") * 25000 + 75000))
        .otherwise(col("g") * 25000 + 75000)
        .cast("decimal(15,2)").as("salary"),
      // gamma-ish (sum of two uniforms, scaled), 2% 1000× outliers
      when(col("a") >= 0.08 && col("a") < 0.10,
        (col("p1") + col("p2")) * 500 * 1000)
        .otherwise((col("p1") + col("p2")) * 500)
        .cast("decimal(15,2)").as("purchase_amount"),
      // 3% invalid category
      when(col("a") >= 0.10 && col("a") < 0.13, lit("Invalid_Category"))
        .otherwise(pick(categories, col("u"))).as("product_category"),
      pick(regions, col("p1")).as("region"),
      pick(statuses, col("p2")).as("customer_status"),
      (col("d") * 50).cast("int").as("transaction_count"),
      date_add(to_date(lit("2023-01-01")), (col("d") * 330).cast("int"))
        .as("effective_from"),
      // 4% inverted date ranges
      when(col("a") >= 0.13 && col("a") < 0.17,
        date_add(to_date(lit("2023-01-01")),
          ((col("d") * 330).cast("int") - 10 - (col("u") * 20).cast("int"))))
        .otherwise(date_add(to_date(lit("2023-01-01")),
          ((col("d") * 330).cast("int") + 1 + (col("u") * 30).cast("int"))))
        .as("effective_to"),
      (col("u") < 0.7).as("current_flag"))
  }

  /** With the 2% duplicate injection (single pass, like Bronze). */
  def withDuplicates(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    users(spark, n, seed)
      .withColumn("_c",
        explode(sequence(lit(1), when(rand(seed + 6) < 0.02, 2).otherwise(1))))
      .drop("_c")

  /** The generator's final clip/round-trip step (`get_dataset.py:66-71`,
    * S3/F15/F16): clip age to [0,120] and purchase to ≤ 1e6 via
    * least/greatest, then the `fillna(0).replace(0, None)` null
    * round-trip on transaction_count — zero and NULL unify to NULL
    * (quirk preserved: genuine zeros are also nulled).
    */
  def clipped(df: DataFrame): DataFrame =
    df
      .withColumn("age", least(greatest(col("age"), lit(0)), lit(120)))
      .withColumn("purchase_amount",
        least(col("purchase_amount"), lit(1000000).cast("decimal(15,2)")))
      .withColumn("transaction_count",
        when(coalesce(col("transaction_count"), lit(0)) === 0,
          lit(null).cast("int")).otherwise(col("transaction_count")))
}
