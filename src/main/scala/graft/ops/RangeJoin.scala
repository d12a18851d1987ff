package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binned interval (range) join — the scale-safe plan for
  * point-in-interval joins with NO equi key. Spark plans a bare
  * `p.ts BETWEEN i.start AND i.end` join as BroadcastNestedLoop (or a
  * cartesian when both sides are big): at 100 TB that is quadratic.
  *
  * The standard fix, used by every production range-join implementation:
  * quantize time into fixed-width bins, explode each interval into the
  * bins it covers, attach each point to its single bin, equi-join on the
  * bin id (an ordinary shuffled hash join), and re-check the exact
  * predicate. Cost: |points| + Σ interval_spans/bin_width join rows —
  * linear in data for bounded interval lengths, never |P|×|I|.
  *
  * A point pairs with a given interval at most once (the point has
  * exactly one bin), so no post-join dedup is needed.
  *
  * The DuckDB oracle runs the same semantics as a plain BETWEEN range
  * join (its IEJoin handles that natively) — checking our binned physical
  * plan against an engine-native range join.
  */
object RangeJoin {

  /** Count points falling inside each interval. `intervals` must carry
    * `keyCols` (a unique interval key) plus `startCol`/`endCol`;
    * `points` must carry timestamp `ptCol`. Returns `intervals` +
    * `n_points` (0 for empty intervals, left-join semantics).
    */
  def binnedCount(points: DataFrame, ptCol: String,
                  intervals: DataFrame, startCol: String, endCol: String,
                  keyCols: Seq[String], binSeconds: Long = 3600L): DataFrame = {
    val pts = points
      .withColumn("_bin", expr(s"CAST($ptCol AS LONG) DIV $binSeconds"))
    // guard inverted intervals BEFORE the explode: Spark's sequence(hi, lo)
    // runs DESCENDING instead of returning empty, which would fabricate
    // bins; an inverted interval contains no points by definition and
    // still appears in the output with n_points = 0 via the left join
    val ivs = intervals.filter(col(startCol) <= col(endCol)).withColumn("_bin",
      explode(sequence(
        expr(s"CAST($startCol AS LONG) DIV $binSeconds"),
        expr(s"CAST($endCol AS LONG) DIV $binSeconds"))))
    val counts = ivs.join(pts, Seq("_bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n_points"))
    intervals.join(counts, keyCols, "left")
      .withColumn("n_points", coalesce(col("n_points"), lit(0L)))
  }

  /** Registered instance: per session interval, the number of `error`
    * events (from ANY user — no equi key, a genuine range join) inside
    * [session_start, session_end].
    */
  def sessionErrorLoad(spark: SparkSession, dir: String): DataFrame = {
    val sessions = EventsOps.sessions(spark, dir)
      .select("user_id", "session_seq", "n_events", "session_start", "session_end")
    val errors = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "error").select("ts")
    binnedCount(errors, "ts", sessions, "session_start", "session_end",
      Seq("user_id", "session_seq"))
      .select("user_id", "session_seq", "n_events", "n_points")
      .withColumnRenamed("n_points", "n_concurrent_errors")
  }

  // ---------- DuckDB oracle: plain BETWEEN range join (IEJoin) ----------

  def sessionErrorLoadSql(gapMinutes: Int = 30): String =
    s"""SELECT s.user_id, s.session_seq, s.n_events,
       |       count(e.ts) AS n_concurrent_errors
       |FROM (${EventsOps.sessionsSql(gapMinutes)}) s
       |LEFT JOIN (SELECT ts FROM events WHERE event_type = 'error') e
       |  ON e.ts BETWEEN s.session_start AND s.session_end
       |GROUP BY 1, 2, 3""".stripMargin
}
