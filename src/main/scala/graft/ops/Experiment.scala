package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Experimentation analytics — the two checks a product/data team runs
  * on an event stream before and after shipping a change: a hash-bucket
  * A/B conversion readout with a two-proportion z-statistic, and CUSUM
  * change-point detection over the daily volume series.
  *
  * Reference scope: the reference's DQ/dashboard layer computes rates and
  * daily trends (dq_dashboard.py); these extend the same daily-grain
  * statistics to the experiment readouts every event pipeline grows.
  *
  * Determinism: arm assignment is the house salted-md5 hash (the
  * [[Sampling.hashUniform]] rule — membership stable under re-sharding
  * and replayable in DuckDB); every rate and test statistic is computed
  * from exact integer counts in a fixed expression order, then cast to
  * the 6-dp decimal grid at the output edge.
  */
object Experiment {

  /** A/B conversion readout: users are hashed into arms (50/50), a user
    * converts if they emitted ≥1 `purchase` event. Two rows — per arm:
    * user and converter counts, conversion rate; plus the shared lift
    * (B − A, absolute) and pooled two-proportion z-statistic, broadcast
    * onto both rows so the readout is self-contained.
    *
    * Scale shape: one user-grain aggregate (the only row-level shuffle;
    * map-side combines `max(is_purchase)`), then a 2-row arm aggregate
    * and a broadcast of the one-row test statistic. The z computation
    * touches 4 integers regardless of corpus size.
    */
  def abTest(spark: SparkSession, dir: String, salt: String = "ab1"): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
      .select(
        when(Sampling.hashUniform(col("user_id"), salt) < 0.5, "A")
          .otherwise("B").as("arm"),
        col("converted"))
    val arms = users.groupBy("arm").agg(
      count(lit(1)).as("n_users"),
      sum("converted").as("n_converted"))
    val a = col("arm") === "A"
    val wide = arms.agg(
      sum(when(a, col("n_users"))).as("na"),
      sum(when(a, col("n_converted"))).as("ca"),
      sum(when(!a, col("n_users"))).as("nb"),
      sum(when(!a, col("n_converted"))).as("cb"))
    val pa = col("ca").cast("double") / col("na").cast("double")
    val pb = col("cb").cast("double") / col("nb").cast("double")
    val pp = (col("ca") + col("cb")).cast("double") / (col("na") + col("nb")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("na").cast("double") + lit(1.0) / col("nb").cast("double")))
    val stats = wide.select(
      (pb - pa).cast("decimal(18,6)").as("lift_abs"),
      ((pb - pa) / when(se === 0.0, lit(null)).otherwise(se))
        .cast("decimal(18,6)").as("z_stat"))
    arms.crossJoin(Bcast.ifBounded(stats, Bcast.OneRow))
      .select(col("arm"), col("n_users"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_users").cast("double"))
          .cast("decimal(18,6)").as("conv_rate"),
        col("lift_abs"), col("z_stat"))
  }

  def abTestSql(salt: String = "ab1"): String = {
    val u = s"CAST(CAST('0x' || substr(md5('$salt' || ':' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0"
    s"""WITH users AS (
       |  SELECT user_id,
       |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
       |  FROM events GROUP BY 1
       |), armed AS (
       |  SELECT CASE WHEN $u < 0.5 THEN 'A' ELSE 'B' END AS arm, converted
       |  FROM users
       |), arms AS (
       |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
       |         CAST(SUM(converted) AS BIGINT) AS n_converted
       |  FROM armed GROUP BY 1
       |), wide AS (
       |  SELECT CAST(SUM(CASE WHEN arm = 'A' THEN n_users END) AS BIGINT) AS na,
       |         CAST(SUM(CASE WHEN arm = 'A' THEN n_converted END) AS BIGINT) AS ca,
       |         CAST(SUM(CASE WHEN arm = 'B' THEN n_users END) AS BIGINT) AS nb,
       |         CAST(SUM(CASE WHEN arm = 'B' THEN n_converted END) AS BIGINT) AS cb
       |  FROM arms
       |), stats AS (
       |  SELECT
       |    CAST(CAST(CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
       |      - CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS lift_abs,
       |    CAST(CAST((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
       |        - CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
       |      / NULLIF(sqrt((CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
       |          * (1.0 - CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
       |          * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))), 0.0)
       |      AS DECIMAL(18,6)) AS DOUBLE) AS z_stat
       |  FROM wide
       |)
       |SELECT arm, n_users, n_converted,
       |       CAST(CAST(CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE)
       |         AS DECIMAL(18,6)) AS DOUBLE) AS conv_rate,
       |       lift_abs, z_stat
       |FROM arms, stats""".stripMargin
  }

  /** CUSUM change-point detection over the per-type daily event counts:
    * the sequential statistic that catches a sustained small shift the
    * per-day z-score test ([[EventsOps.dailyAnomalies]]) misses, because
    * it accumulates deviation instead of testing days in isolation.
    *
    * Arithmetic is kept INTEGER throughout so both engines agree bitwise
    * despite the running window: with `S` the type's total and `N` its
    * day count, the scaled deviation of day `i` is `n_i·N − S` (an exact
    * bigint) and the one-sided CUSUM is the running sum of those minus
    * the running minimum (the standard `max(0, ·)` recursion unrolled —
    * `S_i = CS_i − min(0, min_{j≤i} CS_j)` needs no float fold). The
    * reported `cusum_days` divides by `S` on the decimal grid: the
    * accumulated excess measured in average-day volumes. A day is
    * flagged once the excess tops `threshDays` average days.
    *
    * Scale shape: one map-side-combined (type, day) count is the only
    * row-level shuffle; the windows run over type-partitioned day-grain
    * series (≤ days rows per partition — bounded by the calendar, not
    * the corpus).
    */
  def cusum(spark: SparkSession, dir: String, threshDays: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("n"))
    val tot = daily.groupBy("event_type").agg(
      sum("n").as("s"), count(lit(1)).as("days"))
    val w = Window.partitionBy("event_type").orderBy("event_date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = daily.join(tot, "event_type")
      .withColumn("cs", sum(col("n") * col("days") - col("s")).over(w))
    dev
      .withColumn("cusum_scaled", col("cs") - least(lit(0L), min("cs").over(w)))
      .select(col("event_type"), col("event_date"), col("n"),
        (col("cusum_scaled").cast("double") / col("s").cast("double"))
          .cast("decimal(18,6)").as("cusum_days"),
        (col("cusum_scaled").cast("double") > lit(threshDays) * col("s").cast("double"))
          .as("shifted"))
  }

  def cusumSql(threshDays: Double = 2.0): String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS event_date,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2
       |), tot AS (
       |  SELECT event_type, CAST(sum(n) AS BIGINT) AS s,
       |         CAST(count(*) AS BIGINT) AS days
       |  FROM daily GROUP BY 1
       |), cs AS (
       |  SELECT d.event_type, d.event_date, d.n, t.s, t.days,
       |         CAST(SUM(d.n * t.days - t.s) OVER (
       |           PARTITION BY d.event_type ORDER BY d.event_date
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cs
       |  FROM daily d JOIN tot t USING (event_type)
       |), cus AS (
       |  SELECT event_type, event_date, n, s, days,
       |         cs - LEAST(CAST(0 AS BIGINT), CAST(MIN(cs) OVER (
       |           PARTITION BY event_type ORDER BY event_date
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)) AS cusum_scaled
       |  FROM cs
       |)
       |SELECT event_type, event_date, n,
       |       CAST(CAST(CAST(cusum_scaled AS DOUBLE) / CAST(s AS DOUBLE)
       |         AS DECIMAL(18,6)) AS DOUBLE) AS cusum_days,
       |       CAST(cusum_scaled AS DOUBLE) > $threshDays * CAST(s AS DOUBLE) AS shifted
       |FROM cus""".stripMargin
}
