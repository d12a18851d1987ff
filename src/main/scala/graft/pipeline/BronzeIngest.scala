package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 — the reference's row-tolerant ingest
  * (`/root/reference/data-pipeline/src/load_data_to_db.py:17-51`: iterate
  * rows, INSERT each, log-and-continue on failure) re-expressed as a
  * set-based validity split: one pass tags every row with the first
  * violated rule; good rows load, bad rows quarantine WITH the reason —
  * strictly more auditable than the reference's print-and-drop, and
  * distributed (no per-row round trips).
  *
  * The rules mirror what would make the reference's INSERT fail against
  * the structured DDL (`01_init_all.sql:23-38`) — NOT NULL, CHECK ranges —
  * evaluated on the raw staging frame.
  */
object BronzeIngest {

  /** (rule name, violation predicate) — first match wins. */
  val rules: Seq[(String, Column)] = Seq(
    "null_user_id" -> col("user_id").isNull,
    "null_dates" -> (col("effective_from").isNull || col("effective_to").isNull),
    "negative_salary" -> (col("salary") < 0),
    "purchase_out_of_range" -> (col("purchase_amount") < 0 || col("purchase_amount") > 100000),
    "age_out_of_range" -> (col("age") < 18 || col("age") > 100),
    "negative_txn_count" -> (col("transaction_count") < 0),
    "inverted_date_range" -> (col("effective_to") < col("effective_from"))
  )

  private val reason: Column =
    rules.foldRight(lit(null).cast("string")) { case ((name, pred), acc) =>
      when(pred, name).otherwise(acc)
    }

  /** Tag every row with its quarantine reason (NULL = good). */
  def tagged(bronze: DataFrame): DataFrame =
    bronze.withColumn("quarantine_reason", reason)

  def good(bronze: DataFrame): DataFrame =
    tagged(bronze).filter(col("quarantine_reason").isNull).drop("quarantine_reason")

  def quarantined(bronze: DataFrame): DataFrame =
    tagged(bronze).filter(col("quarantine_reason").isNotNull)

  /** Per-reason quarantine tally (the reference's error log, aggregated). */
  def stats(spark: SparkSession, dir: String): DataFrame =
    tagged(Bronze(spark, dir))
      .groupBy(coalesce(col("quarantine_reason"), lit("ok")).as("reason"))
      .agg(count(lit(1)).as("n_rows"))

  /** DuckDB oracle for [[stats]] over the bronze CTE (first rule in Seq
    * order wins, mirroring the foldRight).
    */
  val statsSql: String = {
    s"""SELECT COALESCE(
       |  CASE WHEN user_id IS NULL THEN 'null_user_id'
       |       WHEN effective_from IS NULL OR effective_to IS NULL THEN 'null_dates'
       |       WHEN salary < 0 THEN 'negative_salary'
       |       WHEN purchase_amount < 0 OR purchase_amount > 100000 THEN 'purchase_out_of_range'
       |       WHEN age < 18 OR age > 100 THEN 'age_out_of_range'
       |       WHEN transaction_count < 0 THEN 'negative_txn_count'
       |       WHEN effective_to < effective_from THEN 'inverted_date_range'
       |  END, 'ok') AS reason, COUNT(*) AS n_rows
       |FROM bronze GROUP BY 1""".stripMargin
  }
}
