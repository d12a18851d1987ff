package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** The reference's DQ dashboard
  * (`/root/reference/data-pipeline/src/dq_dashboard.py:22-212`): five
  * analytical queries over the check-results log — overall summary with
  * FILTER aggregates, per-type rollup, recent-10 top-k, daily trend,
  * critical top-5 — re-expressed as DataFrames, plus a driver-side text
  * render of the same sections ([[render]]) whose exact bytes are
  * digest-checked against a DuckDB twin ([[renderDigest]]).
  *
  * The reference queries an append-only `t_dq_check_results` log grown
  * across many runs and anchors its lookback at `CURRENT_DATE`. For a
  * deterministic, oracle-comparable equivalent we (a) synthesize a
  * multi-day history from the `events` table ([[history]]) and (b) anchor
  * the lookback at `max(execution_date)` instead of the wall clock —
  * a scalar subquery, exactly the `MAX(execution_date)` latest-run idiom
  * the reference itself uses (`run_data_quality_checks.py:43-46`, A4).
  *
  * Deviations (documented): `ORDER BY execution_date DESC` top-k queries
  * get a `check_id DESC` tiebreak — the reference's order is
  * nondeterministic on timestamp ties, which a hash-compared result cannot
  * be. `ROUND(x,2)` on the success rate is expressed as a
  * `CAST(... AS DECIMAL(10,2))` so both engines produce the identical
  * exact decimal (IEEE-double `round` bit patterns differ across engines).
  */
object Dashboard {

  private val checkTypes = Seq("correctness", "completeness", "consistency",
    "uniqueness", "validity", "summary")

  /** Deterministic synthetic DQ-results history: one pseudo check result
    * per event, ~70% passed / 20% failed / 10% error, types round-robin.
    * Mirrors `t_dq_check_results` (`t_dq_check_results.sql:4-16`).
    */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val typeCol = element_at(
      array(checkTypes.map(lit): _*), (col("event_id") % 6).cast("int") + 1)
    Tables.events(spark, dir).select(
      col("event_id").as("check_id"),
      typeCol.as("check_type"),
      lit("v_dm_task").as("table_name"),
      concat(lit("check "), typeCol).as("check_name"),
      col("ts").as("execution_date"),
      when(col("event_id") % 10 < 7, "passed")
        .when(col("event_id") % 10 < 9, "failed")
        .otherwise("error").as("status"),
      when(col("event_id") % 10 < 7, lit(null).cast("string"))
        .otherwise(concat(lit("issue in "), col("event_type"))).as("error_message")
    )
  }

  val historySql: String =
    """dq_history AS (
      |  SELECT event_id AS check_id,
      |         ['correctness','completeness','consistency','uniqueness','validity','summary']
      |           [CAST(event_id % 6 AS INT) + 1] AS check_type,
      |         'v_dm_task' AS table_name,
      |         'check ' || ['correctness','completeness','consistency','uniqueness','validity','summary']
      |           [CAST(event_id % 6 AS INT) + 1] AS check_name,
      |         ts AS execution_date,
      |         CASE WHEN event_id % 10 < 7 THEN 'passed'
      |              WHEN event_id % 10 < 9 THEN 'failed' ELSE 'error' END AS status,
      |         CASE WHEN event_id % 10 < 7 THEN NULL
      |              ELSE 'issue in ' || event_type END AS error_message
      |  FROM events
      |)""".stripMargin

  /** history rows within the last `days` days of the anchor
    * (`max(execution_date)::DATE - days`), the reference's
    * `execution_date >= CURRENT_DATE - INTERVAL 'n days'` (F10, P2).
    */
  private def lookback(h: DataFrame, days: Int): DataFrame = {
    val th = h.agg(
      date_sub(max(col("execution_date")).cast("date"), days).cast("timestamp").as("th"))
    h.crossJoin(Bcast.ifBounded(th, Bcast.OneRow)).filter(col("execution_date") >= col("th")).drop("th")
  }

  private def lookbackSql(days: Int): String =
    s"execution_date >= CAST((SELECT CAST(MAX(execution_date) AS DATE) - $days FROM dq_history) AS TIMESTAMP)"

  private val successRate =
    (count(when(col("status") === "passed", 1)).cast("double") * 100.0 /
      nullif(count(lit(1)), lit(0)).cast("double")).cast("decimal(10,2)")

  private def nullif(c: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
    when(c === v, lit(null)).otherwise(c)

  private def summaryFrom(lb: DataFrame): DataFrame =
    lb.agg(
      count(lit(1)).as("total_checks"),
      count(when(col("status") === "passed", 1)).as("passed_checks"),
      count(when(col("status") === "failed", 1)).as("failed_checks"),
      count(when(col("status") === "error", 1)).as("error_checks"),
      successRate.as("success_rate"))

  /** Overall summary with FILTER aggregates (`dq_dashboard.py:30-39`). */
  def summary(spark: SparkSession, dir: String, days: Int = 7): DataFrame =
    summaryFrom(lookback(history(spark, dir), days))

  private def byTypeFrom(lb: DataFrame): DataFrame =
    lb.filter(col("check_type") =!= "summary")
      .groupBy("check_type").agg(
        count(lit(1)).as("total"),
        count(when(col("status") === "passed", 1)).as("passed"),
        count(when(col("status") === "failed", 1)).as("failed"),
        count(when(col("status") === "error", 1)).as("errors"),
        successRate.as("success_rate"))
      .orderBy("check_type")

  /** Per-type rollup (`dq_dashboard.py:66-79`). */
  def byType(spark: SparkSession, dir: String, days: Int = 7): DataFrame =
    byTypeFrom(lookback(history(spark, dir), days))

  /** Recent-10 check results (`dq_dashboard.py:94-104`), deterministic
    * tiebreak on check_id.
    */
  def recent(spark: SparkSession, dir: String, n: Int = 10): DataFrame =
    history(spark, dir)
      .filter(col("check_type") =!= "summary")
      .orderBy(col("execution_date").desc, col("check_id").desc)
      .select("check_name", "status", "execution_date", "error_message")
      .limit(n)

  private def trendFrom(lb: DataFrame): DataFrame =
    lb.filter(col("check_type") =!= "summary")
      .groupBy(to_date(col("execution_date")).as("check_date")).agg(
        count(lit(1)).as("total_checks"),
        count(when(col("status") === "passed", 1)).as("passed_checks"),
        successRate.as("daily_success_rate"))
      .orderBy("check_date")

  /** Daily success-rate trend (`dq_dashboard.py:120-131`). */
  def trend(spark: SparkSession, dir: String, days: Int = 7): DataFrame =
    trendFrom(lookback(history(spark, dir), days))

  private def criticalFrom(lb: DataFrame, n: Int): DataFrame =
    lb.filter(col("status").isin("failed", "error"))
      .orderBy(col("execution_date").desc, col("check_id").desc)
      .select("check_name", "error_message", "execution_date")
      .limit(n)

  /** Critical issues top-5 (`dq_dashboard.py:147-157`). */
  def critical(spark: SparkSession, dir: String, days: Int = 7, n: Int = 5): DataFrame =
    criticalFrom(lookback(history(spark, dir), days), n)

  /** A4/O1 — latest-run selection via MAX scalar subquery + stable
    * check_id ordering (`run_data_quality_checks.py:40-48`), by run date.
    */
  def latestRun(spark: SparkSession, dir: String): DataFrame = {
    val h = history(spark, dir)
    val mx = h.agg(max(to_date(col("execution_date"))).as("mxd"))
    h.crossJoin(Bcast.ifBounded(mx, Bcast.OneRow))
      .filter(to_date(col("execution_date")) === col("mxd"))
      .drop("mxd")
      .orderBy("check_id")
  }

  val latestRunSql: String =
    """SELECT * FROM dq_history
      |WHERE CAST(execution_date AS DATE) =
      |      (SELECT MAX(CAST(execution_date AS DATE)) FROM dq_history)
      |ORDER BY check_id""".stripMargin

  /** Driver-side text rendering (`dq_dashboard.py:47-63,88-92,...`):
    * summary with a pass/fail progress bar, per-type table, daily trend
    * with arrows, critical issues — the reference's console dashboard.
    * Only the five small aggregate results reach the driver.
    */
  def render(spark: SparkSession, dir: String, days: Int = 7): String = {
    // history + lookback computed ONCE for all four sections — the naive
    // per-section calls would rescan the events table eight times
    val lb = lookback(history(spark, dir), days).persist()
    try renderFrom(lb, days)
    finally lb.unpersist()
  }

  private def renderFrom(lb: DataFrame, days: Int): String = {
    val sb = new StringBuilder
    val sumRow = summaryFrom(lb).head()
    val (total, passed, failed, errors) =
      (sumRow.getLong(0), sumRow.getLong(1), sumRow.getLong(2), sumRow.getLong(3))
    val rate = Option(sumRow.getDecimal(4)).fold("n/a")(_.toString)
    sb.append(s"Period: last $days days\n")
    sb.append(s"Total checks: $total\nPassed: $passed ($rate%)\n")
    sb.append(s"Failed: $failed\nErrors: $errors\n")
    if (total > 0) {
      val width = 40
      val p = (passed * width / total).toInt
      val f = (failed * width / total).toInt
      sb.append("Progress: [" + "#" * p + "-" * f + " " * (width - p - f) + "]\n")
    }
    sb.append("\nBy check type:\n")
    byTypeFrom(lb).collect().foreach { r =>
      sb.append(f"  ${r.getString(0)}%-15s total=${r.getLong(1)}%-5d passed=${r.getLong(2)}%-5d failed=${r.getLong(3)}%-5d errors=${r.getLong(4)}%-5d ${r.getDecimal(5)}%s%%\n")
    }
    sb.append("\nDaily trend:\n")
    trendFrom(lb).collect().foreach { r =>
      val rr = r.getDecimal(3)
      val arrow =
        if (rr == null) "?"
        else if (rr.doubleValue >= 95) "up"
        else if (rr.doubleValue <= 80) "down" else "flat"
      sb.append(s"  ${r.getDate(0)} checks=${r.getLong(1)} passed=${r.getLong(2)} rate=$rr% [$arrow]\n")
    }
    sb.append("\nCritical issues:\n")
    // execution_date rendered via an explicit second-precision pattern:
    // java.sql.Timestamp.toString appends a Java-only fractional part
    // (".0") no SQL engine reproduces, and the rendered report is itself
    // digest-checked against a DuckDB twin (dash_render)
    criticalFrom(lb, 5)
      .select(col("check_name"), col("error_message"),
        date_format(col("execution_date"), "yyyy-MM-dd HH:mm:ss").as("ed"))
      .collect().zipWithIndex.foreach { case (r, i) =>
        sb.append(s"  ${i + 1}. ${r.getString(0)} (${r.getString(2)}) ${Option(r.getString(1)).getOrElse("")}\n")
      }
    sb.toString
  }

  /** §3.3 closure — the rendered console report made driver-checkable:
    * md5 + length of [[render]]'s exact text, hash-verified against an
    * independently string-assembled DuckDB report ([[renderSql]]). What
    * is verified is THIS repo's render analogue of the reference's
    * dashboard (`dq_dashboard.py:22-212` renders Russian-labeled text
    * with a different bar format — byte parity with it is not the claim);
    * the claim is that the render path itself, padding/bar/arrows/
    * timestamp formatting included, is oracle-checked rather than
    * display-only.
    *
    * NOTE: eager by design — invoking this runs [[render]]'s four
    * bounded collects immediately (a few hundred rows of DQ log), unlike
    * the other entries which stay lazy until the driver writes them. It
    * also recomputes the sections that dash_summary/by_type/trend/
    * critical5 compute as standalone queries: the digest must cover the
    * text EXACTLY as a user would print it, so it cannot share their
    * doublified output frames.
    */
  def renderDigest(spark: SparkSession, dir: String, days: Int = 7): DataFrame = {
    val text = render(spark, dir, days)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    import spark.implicits._
    Seq((md5, text.length.toLong)).toDF("render_md5", "render_len")
  }

  /** DuckDB twin of [[render]] → (md5, length): assembles the report text
    * with the same section queries, the same `%-Ns`-style padding (rpad
    * guarded to Java's no-truncate semantics), the same integer-division
    * progress bar, arrow thresholds, and DECIMAL → string rendering.
    */
  def renderSql(days: Int = 7): String = {
    // Java f"%-${w}s" pads but never truncates; bare rpad would truncate
    def pad(e: String, w: Int) =
      s"(CASE WHEN length($e) >= $w THEN $e ELSE rpad($e, $w, ' ') END)"
    def num(e: String) = pad(s"CAST($e AS VARCHAR)", 5)
    val rate =
      """CAST(CAST(COUNT(*) FILTER (WHERE status = 'passed') AS DOUBLE) * 100.0
        |              / NULLIF(COUNT(*), 0) AS DECIMAL(10,2))""".stripMargin
    s"""WITH $historySql, lb AS (
       |  SELECT * FROM dq_history WHERE ${lookbackSql(days)}
       |), s AS (
       |  SELECT COUNT(*) AS total,
       |         COUNT(*) FILTER (WHERE status = 'passed') AS passed,
       |         COUNT(*) FILTER (WHERE status = 'failed') AS failed,
       |         COUNT(*) FILTER (WHERE status = 'error') AS errors,
       |         $rate AS rate
       |  FROM lb
       |), head AS (
       |  SELECT 'Period: last $days days' || chr(10)
       |      || 'Total checks: ' || total || chr(10)
       |      || 'Passed: ' || passed || ' (' || COALESCE(CAST(rate AS VARCHAR), 'n/a') || '%)' || chr(10)
       |      || 'Failed: ' || failed || chr(10)
       |      || 'Errors: ' || errors || chr(10)
       |      || CASE WHEN total > 0 THEN
       |           'Progress: [' || repeat('#', CAST(passed * 40 // total AS INT))
       |             || repeat('-', CAST(failed * 40 // total AS INT))
       |             || repeat(' ', CAST(40 - passed * 40 // total - failed * 40 // total AS INT))
       |             || ']' || chr(10)
       |         ELSE '' END AS txt
       |  FROM s
       |), bt AS (
       |  SELECT check_type, COUNT(*) AS total,
       |         COUNT(*) FILTER (WHERE status = 'passed') AS passed,
       |         COUNT(*) FILTER (WHERE status = 'failed') AS failed,
       |         COUNT(*) FILTER (WHERE status = 'error') AS errors,
       |         $rate AS rate
       |  FROM lb WHERE check_type != 'summary' GROUP BY check_type
       |), btx AS (
       |  SELECT COALESCE(string_agg(
       |    '  ' || ${pad("check_type", 15)} || ' total=' || ${num("total")}
       |        || ' passed=' || ${num("passed")} || ' failed=' || ${num("failed")}
       |        || ' errors=' || ${num("errors")} || ' '
       |        || COALESCE(CAST(rate AS VARCHAR), 'null') || '%' || chr(10),
       |    '' ORDER BY check_type), '') AS txt
       |  FROM bt
       |), tr AS (
       |  SELECT CAST(execution_date AS DATE) AS d, COUNT(*) AS checks,
       |         COUNT(*) FILTER (WHERE status = 'passed') AS passed,
       |         $rate AS rate
       |  FROM lb WHERE check_type != 'summary' GROUP BY 1
       |), trx AS (
       |  SELECT COALESCE(string_agg(
       |    '  ' || CAST(d AS VARCHAR) || ' checks=' || checks || ' passed=' || passed
       |        || ' rate=' || COALESCE(CAST(rate AS VARCHAR), 'null') || '% ['
       |        || CASE WHEN rate IS NULL THEN '?' WHEN rate >= 95 THEN 'up'
       |                WHEN rate <= 80 THEN 'down' ELSE 'flat' END || ']' || chr(10),
       |    '' ORDER BY d), '') AS txt
       |  FROM tr
       |), cr AS (
       |  SELECT * FROM (
       |    SELECT check_name, error_message,
       |           strftime(execution_date, '%Y-%m-%d %H:%M:%S') AS ed,
       |           row_number() OVER (ORDER BY execution_date DESC, check_id DESC) AS rn
       |    FROM lb WHERE status IN ('failed', 'error')
       |  ) WHERE rn <= 5
       |), crx AS (
       |  SELECT COALESCE(string_agg(
       |    '  ' || rn || '. ' || check_name || ' (' || ed || ') '
       |        || COALESCE(error_message, '') || chr(10), '' ORDER BY rn), '') AS txt
       |  FROM cr
       |), rep AS (
       |  SELECT head.txt || chr(10) || 'By check type:' || chr(10) || btx.txt
       |      || chr(10) || 'Daily trend:' || chr(10) || trx.txt
       |      || chr(10) || 'Critical issues:' || chr(10) || crx.txt AS txt
       |  FROM head, btx, trx, crx
       |)
       |SELECT md5(txt) AS render_md5, CAST(length(txt) AS BIGINT) AS render_len
       |FROM rep""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_latest_run" -> ((s, dir) => latestRun(s, dir)),
    "dq_history" -> ((s, dir) => history(s, dir)),
    "dash_summary" -> ((s, dir) => summary(s, dir)),
    "dash_by_type" -> ((s, dir) => byType(s, dir)),
    "dash_recent10" -> ((s, dir) => recent(s, dir)),
    "dash_trend" -> ((s, dir) => trend(s, dir)),
    "dash_critical5" -> ((s, dir) => critical(s, dir)),
    "dash_render" -> ((s, dir) => renderDigest(s, dir))
  )

  private val prefix = "WITH " + historySql

  def oracles: Map[String, String] = Map(
    "dq_history" -> (prefix + " SELECT * FROM dq_history"),
    "dq_latest_run" -> (prefix + " " + latestRunSql),
    "dash_summary" -> (prefix + s"""
      | SELECT COUNT(*) AS total_checks,
      |        COUNT(*) FILTER (WHERE status = 'passed') AS passed_checks,
      |        COUNT(*) FILTER (WHERE status = 'failed') AS failed_checks,
      |        COUNT(*) FILTER (WHERE status = 'error') AS error_checks,
      |        CAST(CAST(CAST(COUNT(*) FILTER (WHERE status = 'passed') AS DOUBLE) * 100.0
      |             / NULLIF(COUNT(*), 0) AS DECIMAL(10,2)) AS DOUBLE) AS success_rate
      | FROM dq_history WHERE ${lookbackSql(7)}""".stripMargin),
    "dash_by_type" -> (prefix + s"""
      | SELECT check_type, COUNT(*) AS total,
      |        COUNT(*) FILTER (WHERE status = 'passed') AS passed,
      |        COUNT(*) FILTER (WHERE status = 'failed') AS failed,
      |        COUNT(*) FILTER (WHERE status = 'error') AS errors,
      |        CAST(CAST(CAST(COUNT(*) FILTER (WHERE status = 'passed') AS DOUBLE) * 100.0
      |             / NULLIF(COUNT(*), 0) AS DECIMAL(10,2)) AS DOUBLE) AS success_rate
      | FROM dq_history WHERE ${lookbackSql(7)} AND check_type != 'summary'
      | GROUP BY check_type ORDER BY check_type""".stripMargin),
    "dash_recent10" -> (prefix + """
      | SELECT check_name, status, execution_date, error_message
      | FROM dq_history WHERE check_type != 'summary'
      | ORDER BY execution_date DESC, check_id DESC LIMIT 10""".stripMargin),
    "dash_trend" -> (prefix + s"""
      | SELECT CAST(execution_date AS DATE) AS check_date,
      |        COUNT(*) AS total_checks,
      |        COUNT(*) FILTER (WHERE status = 'passed') AS passed_checks,
      |        CAST(CAST(CAST(COUNT(*) FILTER (WHERE status = 'passed') AS DOUBLE) * 100.0
      |             / NULLIF(COUNT(*), 0) AS DECIMAL(10,2)) AS DOUBLE) AS daily_success_rate
      | FROM dq_history WHERE ${lookbackSql(7)} AND check_type != 'summary'
      | GROUP BY 1 ORDER BY check_date""".stripMargin),
    "dash_critical5" -> (prefix + s"""
      | SELECT check_name, error_message, execution_date
      | FROM dq_history
      | WHERE status IN ('failed', 'error') AND ${lookbackSql(7)}
      | ORDER BY execution_date DESC, check_id DESC LIMIT 5""".stripMargin),
    "dash_render" -> renderSql()
  )
}
