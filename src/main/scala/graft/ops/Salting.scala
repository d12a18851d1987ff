package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-safe aggregation: the two-phase salted groupBy. A heavy key that
  * would pin one reducer is split across `salts` partial groups
  * (key, salt) — map-side combine plus the salted shuffle spread the hot
  * key over the cluster — then the partials merge in a second, tiny
  * aggregation keyed on the original key.
  *
  * Results are IDENTICAL to the plain groupBy (the registered query
  * shares its oracle with `events_top_users`); only the physical shuffle
  * distribution changes. AQE's skew-join handling covers joins; salting
  * is the aggregation-side counterpart for when a single group's partial
  * state is itself too hot.
  */
object Salting {

  /** Two-phase count+sum per key with `salts`-way salting. */
  def saltedUserTotals(df: DataFrame, salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("user_id"), col("_salt"))
      .agg(count(lit(1)).as("_n"),
        sum(col("value").cast("decimal(18,2)")).as("_v"))
      .groupBy("user_id")
      .agg(sum("_n").as("n_events"),
        sum("_v").cast("decimal(18,2)").as("total_value"))

  /** `events_top_users` computed through the salted path — same result,
    * skew-immune plan.
    */
  def topUsersSalted(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    saltedUserTotals(Tables.events(spark, dir))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(k)
}
