package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

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

  /** The diagnostic that DECIDES whether salting (or AQE skew handling)
    * is needed for a key: one-row skew report for `events.user_id` —
    * key cardinality, hottest-key share, top-10 share, mean occupancy.
    * top1_share near 1/n_keys means a uniform key; a large top1_share
    * names the reducer that will straggle. One counting aggregate (the
    * same shuffle the production groupBy would do) + two one-row
    * aggregates joined by broadcast; the top-10 is a total order
    * (count desc, key) so ties cannot flap the report. The counts frame
    * is memoized (lineage-cut snapshot) so its shuffle runs ONCE even
    * though two report branches consume it.
    */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    val counts = graft.Memo(spark, "skew_user_counts", dir, "skew") {
      Tables.events(spark, dir)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    }
    val top = counts.orderBy(col("cnt").desc, col("user_id")).limit(10)
      .agg(sum("cnt").as("top10_rows"), max("cnt").as("max_cnt"))
    counts.agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"))
      .crossJoin(Bcast.ifBounded(top, Bcast.OneRow))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"), col("top10_rows"),
        (col("max_cnt").cast("double") / col("n_rows")).as("top1_share"),
        (col("top10_rows").cast("double") / col("n_rows")).as("top10_share"),
        (col("n_rows").cast("double") / col("n_keys")).as("avg_per_key"))
  }

  val skewReportSql: String =
    """WITH c AS (
      |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
      |), t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows FROM c
      |), tp AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS top10_rows, CAST(MAX(cnt) AS BIGINT) AS max_cnt
      |  FROM (SELECT user_id, cnt FROM c ORDER BY cnt DESC, user_id LIMIT 10)
      |)
      |SELECT t.n_rows, t.n_keys, tp.max_cnt, tp.top10_rows,
      |       CAST(tp.max_cnt AS DOUBLE) / t.n_rows AS top1_share,
      |       CAST(tp.top10_rows AS DOUBLE) / t.n_rows AS top10_share,
      |       CAST(t.n_rows AS DOUBLE) / t.n_keys AS avg_per_key
      |FROM t, tp""".stripMargin
}
