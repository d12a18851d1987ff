package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distribution-drift detection — Population Stability Index between
  * the first and second half of the event-time range, per value bin:
  * the monitoring check a production pipeline runs before trusting new
  * data against the distribution it was calibrated on (PSI is the
  * standard credit-scoring/ML-monitoring statistic; > 0.2 conventionally
  * flags actionable drift).
  *
  * The period split is the integer-microsecond midpoint of the observed
  * range (deterministic in both engines — no wall clock); bins are a
  * fixed 10-bucket grid over the value domain with clamped edges, laid
  * down as a generated spine so empty bins appear with smoothed zero
  * counts rather than vanishing. Counts are add-half smoothed
  * (`(c + 0.5)/(n + 5)`) so the log term is defined for empty bins.
  *
  * Scale shape: one 2-row min/max aggregate, one map-side-combined
  * (period, bin) count — 20 groups — broadcast-joined to the 10-row
  * spine; everything after the count is constant-size work. No shuffle
  * touches row-level data beyond the one counting aggregate.
  */
object Drift {

  /** Per-bin PSI report: counts, smoothed shares, and the PSI
    * contribution `(p2 − p1)·ln(p2/p1)` on the 6-dp decimal grid.
    */
  def psi(spark: SparkSession, dir: String,
          binWidth: Double = 50.0, nBins: Int = 10): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us"), col("value"))
    val mid = ev.agg(((min("us") + max("us")) / lit(2L)).cast("long").as("mid_us"))
    val binned = ev.crossJoin(broadcast(mid))
      .select(
        when(col("us") < col("mid_us"), lit("p1")).otherwise(lit("p2")).as("period"),
        least(lit(nBins - 1), greatest(lit(0),
          floor(col("value") / binWidth).cast("int"))).as("bin"))
      .groupBy("period", "bin").agg(count(lit(1)).as("cnt"))
    val spine = spark.range(nBins).select(col("id").cast("int").as("bin"))
    def side(p: String, n: String): DataFrame = spine
      .join(binned.filter(col("period") === p).select("bin", "cnt"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("cnt"), lit(0L)).as(n))
    val joined = side("p1", "n1").join(side("p2", "n2"), "bin")
      .crossJoin(broadcast(
        binned.agg(
          sum(when(col("period") === "p1", col("cnt")).otherwise(0L)).as("t1"),
          sum(when(col("period") === "p2", col("cnt")).otherwise(0L)).as("t2"))))
    val p1 = (col("n1").cast("double") + 0.5) / (col("t1").cast("double") + 0.5 * nBins)
    val p2 = (col("n2").cast("double") + 0.5) / (col("t2").cast("double") + 0.5 * nBins)
    joined.select(
      col("bin"), col("n1"), col("n2"),
      p1.cast("decimal(18,6)").as("share_p1"),
      p2.cast("decimal(18,6)").as("share_p2"),
      ((p2 - p1) * log(p2 / p1)).cast("decimal(18,6)").as("psi_contrib"))
  }

  def psiSql(binWidth: Double = 50.0, nBins: Int = 10): String =
    s"""WITH ev AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events
       |), mid AS (
       |  SELECT (MIN(us) + MAX(us)) // 2 AS mid_us FROM ev
       |), binned AS (
       |  SELECT CASE WHEN ev.us < mid.mid_us THEN 'p1' ELSE 'p2' END AS period,
       |         LEAST(${nBins - 1}, GREATEST(0,
       |           CAST(FLOOR(value / $binWidth) AS INT))) AS bin,
       |         COUNT(*) AS cnt
       |  FROM ev, mid GROUP BY 1, 2
       |), spine AS (
       |  SELECT CAST(unnest(generate_series(0, ${nBins - 1})) AS INT) AS bin
       |), s1 AS (
       |  SELECT spine.bin, CAST(COALESCE(b.cnt, 0) AS BIGINT) AS n1
       |  FROM spine LEFT JOIN (SELECT bin, cnt FROM binned WHERE period = 'p1') b USING (bin)
       |), s2 AS (
       |  SELECT spine.bin, CAST(COALESCE(b.cnt, 0) AS BIGINT) AS n2
       |  FROM spine LEFT JOIN (SELECT bin, cnt FROM binned WHERE period = 'p2') b USING (bin)
       |), tot AS (
       |  SELECT CAST(SUM(CASE WHEN period = 'p1' THEN cnt ELSE 0 END) AS BIGINT) AS t1,
       |         CAST(SUM(CASE WHEN period = 'p2' THEN cnt ELSE 0 END) AS BIGINT) AS t2
       |  FROM binned
       |), sh AS (
       |  SELECT s1.bin, s1.n1, s2.n2,
       |         (CAST(s1.n1 AS DOUBLE) + 0.5) / (CAST(tot.t1 AS DOUBLE) + ${0.5 * nBins}) AS p1,
       |         (CAST(s2.n2 AS DOUBLE) + 0.5) / (CAST(tot.t2 AS DOUBLE) + ${0.5 * nBins}) AS p2
       |  FROM s1 JOIN s2 USING (bin), tot
       |)
       |SELECT bin, n1, n2,
       |       CAST(CAST(p1 AS DECIMAL(18,6)) AS DOUBLE) AS share_p1,
       |       CAST(CAST(p2 AS DECIMAL(18,6)) AS DOUBLE) AS share_p2,
       |       CAST(CAST((p2 - p1) * ln(p2 / p1) AS DECIMAL(18,6)) AS DOUBLE) AS psi_contrib
       |FROM sh""".stripMargin
}
