package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event/time-series operators over the `events` table
  * (`event_id, ts, user_id, event_type, value, props`) — the batch twins
  * of the streaming aggregations in graft.streaming.EventStream.
  *
  * Scale notes: the daily rollup is one hash-aggregate shuffle keyed on
  * (day, type) — low cardinality, map-side partial aggregation does most
  * of the work. Sessionization shuffles once on user_id and sorts within
  * partitions by ts (the Window spec); no global sort, no collect.
  */
object EventsOps {

  /** A6-style time-bucketed rollup: per (day, event_type) counts + value
    * stats.
    */
  def daily(spark: SparkSession, dir: String): DataFrame = {
    // Sum DECIMALs, not doubles: a double sum's low bits depend on
    // accumulation order (partition scheduling), which both breaks oracle
    // parity and makes reruns non-reproducible at .xxx5 rounding edges.
    val decSum = sum(col("value").cast("decimal(18,2)"))
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        decSum.cast("decimal(18,2)").as("total_value"),
        // unrounded double: the decimal sum casts to double exactly the
        // same in both engines; rounding to DECIMAL would hit engine-
        // specific half-up-vs-binary behavior at .xxx5 boundaries
        (decSum.cast("double") / count(lit(1))).as("avg_value"))
  }

  /** Incremental maintenance of [[daily]] — the materialized-view shape
    * at 100 TB: never rescan history. State is kept at the finest grain
    * the rollup needs — (event_date, event_type, user_id) with
    * (count, value sum) partials — because COUNT(DISTINCT user_id) does
    * NOT merge from coarser partials (distinct counts aren't additive
    * across batches that share users). An update merges the stored state
    * with the delta window's partial aggregate (combiner semantics:
    * union + re-group over state-sized input, no history rescan) and
    * re-rolls up.
    *
    * Registered with state = days before `split`, delta = the rest; the
    * result equals the full-scan [[daily]] for ANY split, so the oracle
    * is `dailySql` itself — the merge path is hash-checked against the
    * one-pass truth.
    */
  def dailyIncremental(spark: SparkSession, dir: String,
                       split: String = "2024-01-16"): DataFrame = {
    val ev = Tables.events(spark, dir)
    def base(df: DataFrame): DataFrame =
      df.groupBy(to_date(col("ts")).as("event_date"), col("event_type"),
          col("user_id"))
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(18,2)")).as("pv"))
    val state = base(ev.filter(to_date(col("ts")) < to_date(lit(split))))
    val delta = base(ev.filter(to_date(col("ts")) >= to_date(lit(split))))
    val merged = state.unionByName(delta)
      .groupBy("event_date", "event_type", "user_id")
      .agg(sum(col("pn")).as("pn"), sum(col("pv")).as("pv"))
    val decSum = sum(col("pv"))
    merged.groupBy("event_date", "event_type")
      .agg(sum(col("pn")).as("n_events"),
        count(lit(1)).as("n_users"),
        decSum.cast("decimal(18,2)").as("total_value"),
        (decSum.cast("double") / sum(col("pn"))).as("avg_value"))
  }

  /** Gap-based sessionization: a session breaks after `gapMinutes` of
    * user inactivity (lag + running sum of boundaries — the standard
    * batch formulation; the streaming twin is a session window with
    * watermarking).
    */
  // memoized: events_sessions and the interval join both consume it, and
  // the latter uses it on BOTH join sides — unmemoized, the whole window
  // chain over events would run twice in one query
  def sessions(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    graft.Memo(spark, s"events_sessions_$gapMinutes", dir, "events_sessions") {
      sessionsUncached(spark, dir, gapMinutes)
    }

  private def sessionsUncached(spark: SparkSession, dir: String, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("session_value"))
  }

  /** Ordered per-session trajectory assembly — the shape behavioral /
    * agent training data ships in: each session becomes ONE example
    * whose payload is the exact time-ordered action sequence. The
    * sessionization is [[sessions]]' flagging verbatim; the assembly is
    * `collect_list(struct(ts, event_id, type))` + `array_sort` — the
    * collect order is partition-nondeterministic, the sort (total key:
    * ts then unique event_id) makes the result exact, which is the only
    * safe way to build ordered sequences in a distributed groupBy.
    * State per group is one session's events (time-gap-bounded), never
    * a user's history. One window pass + one grouped assembly.
    */
  def trajectories(spark: SparkSession, dir: String,
                   gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val seq = transform(
      array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
      s => s.getField("event_type"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        concat_ws(" ", seq).as("trajectory"))
  }

  def trajectoriesSql(gapMinutes: Int = 30): String =
    s"""WITH lagged AS (
       |  SELECT user_id, event_id, ts, event_type,
       |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |                   OR date_diff('second', prev_ts, ts) > ${gapMinutes * 60}
       |                 THEN 1 ELSE 0 END AS new_session
       |  FROM lagged
       |), numbered AS (
       |  SELECT *, SUM(new_session) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM flagged
       |)
       |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       |       CAST(COUNT(*) AS BIGINT) AS n_events,
       |       string_agg(event_type, ' ' ORDER BY ts, event_id) AS trajectory
       |FROM numbered GROUP BY 1, 2""".stripMargin

  /** CDC apply — materialize the final table state from a change log
    * (the Debezium → MERGE INTO pattern every lakehouse ingestion runs):
    * each event is an I/U/D operation on its user's profile row
    * (signup → insert, error → tombstone delete, anything else →
    * update), applied in (ts, event_id) order; the final state keeps
    * each key's LAST operation and drops tombstoned keys.
    *
    * The scale-relevant choice: latest-wins is computed with a
    * map-side-combinable `max_by(payload, orderKey)` aggregate — each
    * task reduces its split to one candidate row per key before the
    * shuffle — NOT a row_number window, which would shuffle and sort
    * every change. The order key (ts, event_id) is total, so the
    * result is deterministic and the DuckDB oracle can use the readable
    * window formulation; both must agree exactly.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val op = when(col("event_type") === "signup", "I")
      .when(col("event_type") === "error", "D").otherwise("U")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), op.as("op"), col("value"))
      .groupBy("user_id")
      .agg(expr("max_by(named_struct('op', op, 'ts', ts, 'value', value)," +
        " named_struct('ts', ts, 'eid', event_id))").as("last"),
        count(lit(1)).as("n_changes"))
      .filter(col("last.op") =!= "D")
      .select(col("user_id"), col("last.op").as("last_op"),
        col("last.ts").as("last_ts"),
        col("last.value").cast("decimal(18,2)").as("last_value"),
        col("n_changes"))
  }

  val cdcApplySql: String =
    """WITH ops AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN event_type = 'signup' THEN 'I'
      |              WHEN event_type = 'error' THEN 'D'
      |              ELSE 'U' END AS op,
      |         value
      |  FROM events
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |              ORDER BY ts DESC, event_id DESC) AS rk,
      |         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
      |  FROM ops
      |)
      |SELECT user_id, op AS last_op, ts AS last_ts,
      |       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value,
      |       CAST(n_changes AS BIGINT) AS n_changes
      |FROM ranked WHERE rk = 1 AND op != 'D'""".stripMargin

  /** O2-style top-k: highest-value users (deterministic tiebreak). */
  def topUsers(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(k)

  /** Semi-structured props: extract the JSON payload's `k` field and
    * aggregate per event type — `get_json_object` is codegen'd; no UDF,
    * no driver-side parsing. (The reference has no JSON anywhere; the
    * events stream carries it, so the engine must handle it.)
    */
  def propsStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        // try_cast: a non-numeric k is NULL, not a runtime error (Spark 4
        // runs ANSI mode by default, where a plain cast would throw)
        expr("try_cast(get_json_object(props, '$.k') AS int)").as("k"))
      .groupBy("event_type")
      .agg(count(when(col("k").isNotNull, 1)).as("n_with_k"),
        min("k").as("min_k"), max("k").as("max_k"),
        sum(col("k").cast("long")).as("sum_k"))

  /** Schema-on-read profiler for the semi-structured `props` column —
    * what a pipeline runs BEFORE writing extraction code like
    * [[propsStats]]: which keys exist, how often, and what type their
    * values look like. The synthetic props are homogeneous (`{"k": n}`),
    * so the query plants the heterogeneity a real event stream has —
    * an extra string key on `event_id % 3 == 0`, an extra boolean on
    * `% 5 == 0`, and a truncated (invalid) payload on `% 7 == 0` — the
    * same planted-evidence policy as the NFC and PII legs.
    *
    * Per key: occurrence count and regex type votes
    * (integer / boolean / other-string) over the extracted raw values;
    * one `_invalid` row counts unparseable payloads (tolerated, not
    * thrown — `json_object_keys` nulls them, matching DuckDB's
    * `json_valid` guard). One scan, keys-grain aggregate (map-side
    * combined); the non-literal JSON path re-parse is bounded by keys
    * per row, not corpus size.
    */
  def propsKeys(spark: SparkSession, dir: String): DataFrame = {
    val messy = Tables.events(spark, dir).select(col("event_id"),
      when(col("event_id") % 7 === 0,
        expr("substring(props, 1, length(props) - 2)"))
        .when(col("event_id") % 3 === 0,
          expr("""concat(substring(props, 1, length(props) - 1), ', "tag": "', event_type, '"}')"""))
        .when(col("event_id") % 5 === 0,
          expr("""concat(substring(props, 1, length(props) - 1), ', "flag": true}')"""))
        .otherwise(col("props")).as("props"))
    val perKey = messy
      .select(col("props"), explode(expr("json_object_keys(props)")).as("key"))
      .withColumn("v", expr("get_json_object(props, concat('$.', key))"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").rlike("^-?[0-9]+$"), 1L).otherwise(0L)).as("n_int"),
        sum(when(col("v").isin("true", "false"), 1L).otherwise(0L)).as("n_bool"),
        sum(when(col("v").rlike("^-?[0-9]+$") || col("v").isin("true", "false"),
          0L).otherwise(1L)).as("n_str"))
    val invalid = messy
      .filter(expr("json_object_keys(props) IS NULL"))
      .agg(count(lit(1)).as("n_rows"))
      .select(lit("_invalid").as("key"), col("n_rows"),
        lit(0L).as("n_int"), lit(0L).as("n_bool"), lit(0L).as("n_str"))
    perKey.unionByName(invalid)
  }

  val propsKeysSql: String =
    """WITH messy AS (
      |  SELECT event_id,
      |         CASE WHEN event_id % 7 = 0 THEN substring(props, 1, length(props) - 2)
      |              WHEN event_id % 3 = 0 THEN substring(props, 1, length(props) - 1)
      |                   || ', "tag": "' || event_type || '"}'
      |              WHEN event_id % 5 = 0 THEN substring(props, 1, length(props) - 1)
      |                   || ', "flag": true}'
      |              ELSE props END AS props
      |  FROM events
      |), k AS (
      |  SELECT props, unnest(json_keys(props)) AS key
      |  FROM messy WHERE json_valid(props)
      |), v AS (
      |  SELECT key, json_extract_string(props, '$.' || key) AS val FROM k
      |), agg AS (
      |  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |         CAST(SUM(CASE WHEN regexp_matches(val, '^-?[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
      |         CAST(SUM(CASE WHEN val IN ('true', 'false') THEN 1 ELSE 0 END) AS BIGINT) AS n_bool,
      |         CAST(SUM(CASE WHEN regexp_matches(val, '^-?[0-9]+$')
      |                         OR val IN ('true', 'false') THEN 0 ELSE 1 END) AS BIGINT) AS n_str
      |  FROM v GROUP BY 1
      |)
      |SELECT * FROM agg
      |UNION ALL
      |SELECT '_invalid' AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(0 AS BIGINT) AS n_int, CAST(0 AS BIGINT) AS n_bool,
      |       CAST(0 AS BIGINT) AS n_str
      |FROM messy WHERE NOT json_valid(props)""".stripMargin

  // TRY_CAST + json_valid guard: malformed JSON or a non-numeric k is
  // NULL on the Spark side (get_json_object + cast), so the oracle must
  // null them too instead of erroring out mid-aggregate
  val propsStatsSql: String =
    """WITH pk AS (
      |  SELECT event_type,
      |         TRY_CAST(CASE WHEN json_valid(props)
      |                       THEN json_extract_string(props, '$.k') END AS INT) AS k
      |  FROM events
      |)
      |SELECT event_type,
      |       COUNT(*) FILTER (WHERE k IS NOT NULL) AS n_with_k,
      |       MIN(k) AS min_k,
      |       MAX(k) AS max_k,
      |       CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k
      |FROM pk GROUP BY 1""".stripMargin

  /** Pivot: daily event counts, one column per event type. Spark's
    * `pivot` with an explicit value list compiles to the same conditional
    * aggregation the oracle spells out — no extra pass to discover keys.
    */
  def dailyPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      // pivot emits NULL for a (date, type) with no rows; the COUNT
      // FILTER formulation (and the oracle) emits 0 — align on 0
      .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))

  /** Exact interpolated quantiles of `value` per event type (Spark
    * `percentile` ≙ DuckDB `quantile_cont`: both rank at (n−1)·p with
    * linear interpolation over the sorted doubles).
    */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        expr("percentile(value, 0.99)").as("p99"))

  /** ROLLUP subtotals: (day, type) → per-day → grand total, NULL-marked
    * like SQL ROLLUP; one shuffle, Catalyst expands the grouping sets.
    */
  def dailyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .rollup(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))

  /** CUBE subtotals — [[dailyRollup]]'s full-lattice sibling: ROLLUP
    * omits the per-type-across-all-days margin a dashboard's column
    * totals need; CUBE emits all four grouping sets in the same single
    * shuffle (Catalyst expands the sets before the aggregate, so each
    * input row fans out map-side — no second pass over events). The
    * per-grouping-set `gid` disambiguates a genuine NULL group key from
    * a subtotal marker, reported as the two explicit grouping flags'
    * packed value exactly like both engines compute it.
    */
  def dailyCube(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"), col("event_type"), col("value"))
      .cube(col("event_date"), col("event_type"))
      .agg((grouping(col("event_date")) * 2 + grouping(col("event_type")))
          .as("gid"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))

  val dailyCubeSql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
      |       CAST(GROUPING(CAST(ts AS DATE)) * 2 + GROUPING(event_type) AS INT) AS gid,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY CUBE (1, 2)""".stripMargin

  // ---------- DuckDB oracles ----------
  // (events ts is TIMESTAMP(NANOS) in parquet; DuckDB truncates to micros
  //  exactly like Tables.events — see Tables.scala.)

  // total_value: DECIMAL accumulation (order-independent), DOUBLE at the
  // output edge — see graft.Parity
  val dailySql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
      |       COUNT(*) AS n_events,
      |       COUNT(DISTINCT user_id) AS n_users,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
      |FROM events GROUP BY 1, 2""".stripMargin

  def sessionsSql(gapMinutes: Int = 30): String =
    s"""WITH lagged AS (
       |  SELECT user_id, event_id, ts, value,
       |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |                   OR date_diff('second', prev_ts, ts) > ${gapMinutes * 60}
       |                 THEN 1 ELSE 0 END AS new_session
       |  FROM lagged
       |), numbered AS (
       |  SELECT *, SUM(new_session) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM flagged
       |)
       |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       |       COUNT(*) AS n_events,
       |       MIN(ts) AS session_start, MAX(ts) AS session_end,
       |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
       |FROM numbered GROUP BY 1, 2""".stripMargin

  val dailyPivotSql: String =
    """SELECT CAST(ts AS DATE) AS event_date,
      |       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |       COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY 1""".stripMargin

  val valueQuantilesSql: String =
    """SELECT event_type,
      |       quantile_cont(value, 0.5) AS p50,
      |       quantile_cont(value, 0.95) AS p95,
      |       quantile_cont(value, 0.99) AS p99
      |FROM events GROUP BY 1""".stripMargin

  val dailyRollupSql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY ROLLUP (1, 2)""".stripMargin

  // ORDER BY the exact decimal sum (not the double output): Spark ranks on
  // the decimal before the output cast, and two distinct DECIMAL(18,2)
  // values beyond 2^53 could collapse to one double
  def topUsersSql(k: Int = 10): String =
    s"""SELECT user_id, COUNT(*) AS n_events,
       |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       |FROM events GROUP BY 1
       |ORDER BY SUM(CAST(value AS DECIMAL(18,2))) DESC, user_id LIMIT $k""".stripMargin

  /** Ordered conversion funnel: how many users progressed signup →
    * click → purchase, each step strictly after the previous one and
    * within [[funnelWindow]] of it (first qualifying timestamp per
    * step). Three aggregate+join stages, all keyed by user_id — after
    * the first shuffle every stage is co-partitioned, no pair-producing
    * step.
    */
  val funnelSteps: Seq[String] = Seq("signup", "click", "purchase")
  val funnelWindow = "INTERVAL 1 DAY"

  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val stages = funnelSteps.zipWithIndex.foldLeft(List.empty[(String, DataFrame)]) {
      case (acc, (step, i)) =>
        val matching = ev.filter(col("event_type") === step)
        val stage = acc match {
          case Nil =>
            matching.groupBy("user_id").agg(min("ts").as("t"))
          case (_, prev) :: _ =>
            matching.join(prev.select(col("user_id"), col("t").as("tprev")), "user_id")
              .filter(col("ts") > col("tprev") &&
                col("ts") <= col("tprev") + expr(funnelWindow))
              .groupBy("user_id").agg(min("ts").as("t"))
        }
        (s"${i + 1}_$step", stage) :: acc
    }.reverse
    stages.map { case (label, df) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(label).as("step"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Daily-volume anomaly detection: per event_type, z-score each day's
    * event count against that type's mean/stddev. Mean and variance are
    * derived from INTEGER sums (Σn, Σn²) — exact in both engines, so the
    * final doubles are bit-identical (a float stddev aggregate would be
    * partition-order dependent). Population variance; |z| > 2 flags.
    */
  def dailyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("days"),
      sum("n").as("s1"),
      sum(col("n") * col("n")).as("s2"))
    val mean = col("s1").cast("double") / col("days").cast("double")
    val variance = col("s2").cast("double") / col("days").cast("double") - mean * mean
    val std = sqrt(variance)
    val z = (col("n").cast("double") - mean) /
      when(std === 0.0, lit(null)).otherwise(std)
    daily.join(stats, "event_type")
      .select(col("event_type"), col("event_date"), col("n"),
        z.as("zscore"), (abs(z) > 2.0).as("is_anomaly"))
  }

  val dailyAnomaliesSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS event_date, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |), stats AS (
      |  SELECT event_type, count(*) AS days,
      |         CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n*n) AS BIGINT) AS s2
      |  FROM daily GROUP BY 1
      |)
      |SELECT d.event_type, d.event_date, d.n,
      |  (CAST(d.n AS DOUBLE) - CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))
      |    / NULLIF(sqrt(CAST(s.s2 AS DOUBLE) / CAST(s.days AS DOUBLE)
      |        - (CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))
      |          * (CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))), 0) AS zscore,
      |  abs((CAST(d.n AS DOUBLE) - CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))
      |    / NULLIF(sqrt(CAST(s.s2 AS DOUBLE) / CAST(s.days AS DOUBLE)
      |        - (CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))
      |          * (CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))), 0)) > 2.0 AS is_anomaly
      |FROM daily d JOIN stats s USING (event_type)""".stripMargin

  /** Last-touch purchase attribution — for every purchase, credit the
    * user's most recent non-purchase event within the preceding hour
    * ('direct' when none): the marketing-analytics join every event
    * warehouse runs. The "most recent preceding touch" is a windowed
    * running MAX over a zero-padded `ts:event_id:type` string — string
    * order equals (ts, event_id) numeric order by construction, which
    * sidesteps engine-specific struct-comparison semantics while keeping
    * the window a plain running max (one user-partitioned window, no
    * self-join of events to events). Output is the attributed-type
    * rollup.
    */
  def attribution(spark: SparkSession, dir: String,
                  windowMinutes: Int = 60): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touchStr = concat_ws(":",
      lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
      lpad(col("event_id").cast("string"), 12, "0"),
      col("event_type"))
    val ev = Tables.events(spark, dir)
      .withColumn("last_touch",
        max(when(col("event_type") =!= "purchase", touchStr)).over(byUser))
    ev.filter(col("event_type") === "purchase")
      .withColumn("touch_us",
        expr("try_cast(split(last_touch, ':')[0] AS BIGINT)"))
      .withColumn("attributed",
        when(col("last_touch").isNotNull &&
          col("touch_us") >= unix_micros(col("ts")) - windowMinutes * 60000000L,
          expr("split(last_touch, ':')[2]")).otherwise(lit("direct")))
      .groupBy(col("attributed").as("attributed_type"))
      .agg(count(lit(1)).as("n_purchases"))
  }

  def attributionSql(windowMinutes: Int = 60): String =
    s"""WITH touched AS (
       |  SELECT user_id, event_id, ts, event_type,
       |         MAX(CASE WHEN event_type <> 'purchase'
       |             THEN lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
       |                  || ':' || lpad(CAST(event_id AS VARCHAR), 12, '0')
       |                  || ':' || event_type END)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
       |  FROM events
       |)
       |SELECT CASE WHEN last_touch IS NOT NULL
       |              AND CAST(string_split(last_touch, ':')[1] AS BIGINT)
       |                  >= epoch_us(CAST(ts AS TIMESTAMP)) - ${windowMinutes * 60000000L}
       |            THEN string_split(last_touch, ':')[3]
       |            ELSE 'direct' END AS attributed_type,
       |       CAST(COUNT(*) AS BIGINT) AS n_purchases
       |FROM touched WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  /** Per-type linear trend + one-day-ahead forecast — OLS over
    * (epoch-day, daily count) computed entirely from integer sums
    * (n·Σxy − Σx·Σy over n·Σx² − (Σx)², the closed normal-equation
    * form), so the slope and forecast are single deterministic double
    * expressions over exact integers — no iterative fit, no float
    * accumulation. This is the capacity-planning readout on top of the
    * same daily rollup every other monitor here shares; one extra
    * metadata-size aggregate.
    */
  def dailyTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("y"))
      .withColumn("x", datediff(col("event_date"), lit("1970-01-01").cast("date")).cast("long"))
    val s = daily.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      max("x").as("max_x"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val intercept = (col("sy").cast("double") - slope * col("sx").cast("double")) /
      col("n").cast("double")
    s.select(col("event_type"), col("n").as("days"),
      slope.as("slope_per_day"),
      (intercept + slope * (col("max_x") + 1).cast("double")).as("forecast_next"))
  }

  val dailyTrendSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
      |         CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)
      |), s AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |         CAST(SUM(x * y) AS BIGINT) AS sxy,
      |         CAST(SUM(x * x) AS BIGINT) AS sxx,
      |         CAST(MAX(x) AS BIGINT) AS max_x
      |  FROM daily GROUP BY 1
      |)
      |SELECT event_type, n AS days,
      |       CAST(n * sxy - sx * sy AS DOUBLE)
      |         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_per_day,
      |       (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
      |          / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n
      |         + CAST(n * sxy - sx * sy AS DOUBLE)
      |           / CAST(n * sxx - sx * sx AS DOUBLE) * (max_x + 1) AS forecast_next
      |FROM s""".stripMargin

  /** Seasonality-aware anomaly detection — [[dailyAnomalies]] with the
    * weekly cycle removed: the baseline is per (event_type, DAY-OF-WEEK)
    * (a quiet Sunday is not an anomaly just because weekdays are busy;
    * the global-z version flags exactly that). Same integer-sum
    * mean/variance machinery, grouped one level finer; the day-of-week
    * is computed portably as `(days-since-epoch + 4) mod 7` (epoch day
    * was a Thursday) — exact integer arithmetic, immune to the engines'
    * differing dayofweek() conventions. Cost is identical to the global
    * version: one (type, day) rollup shuffle, a (type, dow)-grain
    * aggregate of ≤ types×7 rows, one broadcast-size join back.
    */
  def seasonalAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", expr("(datediff(event_date, DATE'1970-01-01') + 4) % 7"))
    val stats = daily.groupBy("event_type", "dow").agg(
      count(lit(1)).as("days"),
      sum("n").as("s1"),
      sum(col("n") * col("n")).as("s2"))
    val mean = col("s1").cast("double") / col("days").cast("double")
    val variance = col("s2").cast("double") / col("days").cast("double") - mean * mean
    val std = sqrt(variance)
    val z = (col("n").cast("double") - mean) /
      when(std === 0.0, lit(null)).otherwise(std)
    daily.join(stats, Seq("event_type", "dow"))
      .select(col("event_type"), col("event_date"), col("dow"), col("n"),
        mean.as("dow_mean"), z.as("zscore"), (abs(z) > 2.0).as("is_anomaly"))
  }

  val seasonalAnomaliesSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS event_date,
      |         ((CAST(ts AS DATE) - DATE '1970-01-01') + 4) % 7 AS dow,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2, 3
      |), stats AS (
      |  SELECT event_type, dow, count(*) AS days,
      |         CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n*n) AS BIGINT) AS s2
      |  FROM daily GROUP BY 1, 2
      |)
      |SELECT d.event_type, d.event_date, CAST(d.dow AS INT) AS dow, d.n,
      |  CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE) AS dow_mean,
      |  (CAST(d.n AS DOUBLE) - CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))
      |    / NULLIF(sqrt(CAST(s.s2 AS DOUBLE) / CAST(s.days AS DOUBLE)
      |        - (CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))
      |          * (CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))), 0) AS zscore,
      |  abs((CAST(d.n AS DOUBLE) - CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))
      |    / NULLIF(sqrt(CAST(s.s2 AS DOUBLE) / CAST(s.days AS DOUBLE)
      |        - (CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))
      |          * (CAST(s.s1 AS DOUBLE) / CAST(s.days AS DOUBLE))), 0)) > 2.0 AS is_anomaly
      |FROM daily d JOIN stats s USING (event_type, dow)""".stripMargin

  /** 7-day trailing moving average of daily event counts per type — the
    * standard smoothing pass over the daily rollup. One extra window over
    * the (type, day) aggregate (≤ types×days rows), partitioned by type:
    * no new shuffle of the raw events. Sums are integers, the single
    * division happens at the edge, so the doubles are bit-identical
    * across engines. ROWS (not RANGE) framing: missing days shrink the
    * window to the rows present, matching the oracle exactly.
    */
  def movingAvg(spark: SparkSession, dir: String, days: Int = 7): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("event_date")
      .rowsBetween(-(days - 1), Window.currentRow)
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_date"), col("event_type"), col("n"),
        (sum(col("n")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as(s"ma$days"))
  }

  /** Exponentially weighted moving average (alpha = 1/2) over the daily
    * value rollup -- the decay-smoothing complement of [[movingAvg]]'s
    * flat window, designed for EXACT cross-engine reproducibility. EWMA
    * is a sequential recurrence, but with alpha = 1/2 and a hard 28-day
    * memory every term is an INTEGER (daily cents, exact) times a POWER
    * OF TWO (2^-k, exact in binary floating point -- multiplying by it
    * only shifts the exponent), so each product is exact and the 28-term
    * sum never rounds: cents fit ~2^24 bits and 28 aligned doublings
    * keep every partial sum under 2^53. The two closing divisions
    * (normalize, cents -> units) are single IEEE ops on exact operands
    * -- bit-identical in both engines regardless of summation order.
    * The trailing window materializes as a day-grain self-join
    * (types x days x 28 rows -- rollup-sized, the raw events are never
    * rescanned), which is also the honest 100 TB plan: smoothing lives
    * at the aggregate grain, not the event grain.
    */
  def ewma(spark: SparkSession, dir: String, memory: Int = 28): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
    val hist = daily.select(col("event_type"),
      col("event_date").as("hist_date"), col("cents"))
    val k = datediff(col("event_date"), col("hist_date")) + 1
    daily.select(col("event_type"), col("event_date"))
      .join(hist, Seq("event_type"))
      .filter(col("hist_date") <= col("event_date") &&
        col("hist_date") > date_sub(col("event_date"), memory))
      .select(col("event_type"), col("event_date"),
        (col("cents").cast("double") * pow(lit(2.0), -k)).as("wy"),
        pow(lit(2.0), -k).as("w"))
      .groupBy("event_type", "event_date")
      .agg(sum("wy").as("num"), sum("w").as("wsum"))
      .select(col("event_type"), col("event_date"),
        (col("num") / col("wsum") / lit(100.0)).as("ewma"))
      .orderBy("event_type", "event_date")
  }

  def ewmaSql(memory: Int = 28): String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS event_date, event_type,
       |         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |)
       |SELECT d.event_type, d.event_date,
       |  SUM(CAST(h.cents AS DOUBLE)
       |      * power(2.0, -(datediff('day', h.event_date, d.event_date) + 1)))
       |  / SUM(power(2.0, -(datediff('day', h.event_date, d.event_date) + 1)))
       |  / 100.0 AS ewma
       |FROM daily d JOIN daily h ON h.event_type = d.event_type
       |  AND h.event_date <= d.event_date
       |  AND h.event_date > d.event_date - INTERVAL $memory DAY
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin


  def movingAvgSql(days: Int = 7): String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS event_date, event_type, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2
       |)
       |SELECT event_date, event_type, n,
       |       CAST(SUM(n) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE)
       |         AS ma$days
       |FROM daily
       |WINDOW w AS (PARTITION BY event_type ORDER BY event_date
       |             ROWS BETWEEN ${days - 1} PRECEDING AND CURRENT ROW)""".stripMargin

  /** DAU / trailing-28-day MAU stickiness — the engagement ratio every
    * product dashboard tracks. The naive formulation (per day, count
    * distinct users over a 28-day range join) is |days| × |user-days|;
    * instead each (user, active-day) pair EXPLODES into the ≤28
    * observation days it contributes to — linear ×window in the distinct
    * user-day table, shuffled once on the observation day for the
    * distinct count. Days with no event in the window simply don't
    * appear (no spine — absence is honest here).
    */
  def stickiness(spark: SparkSession, dir: String, window: Int = 28): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val dau = ud.groupBy(col("d").as("event_date"))
      .agg(countDistinct("user_id").as("dau"))
    val mau = ud
      .withColumn("event_date",
        explode(sequence(col("d"), date_add(col("d"), window - 1))))
      .groupBy("event_date")
      .agg(countDistinct("user_id").as(s"mau$window"))
      // only days that themselves have activity are reported
      .join(dau, "event_date")
    mau.select(col("event_date"), col("dau"), col(s"mau$window"),
      (col("dau").cast("double") / col(s"mau$window")).as("stickiness"))
  }

  def stickinessSql(window: Int = 28): String =
    s"""WITH ud AS (
       |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
       |), dau AS (
       |  SELECT d AS event_date, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1
       |), obs AS (
       |  SELECT CAST(unnest(generate_series(d, d + INTERVAL ${window - 1} DAY,
       |                                     INTERVAL 1 DAY)) AS DATE) AS event_date,
       |         user_id
       |  FROM ud
       |), mau AS (
       |  SELECT event_date, COUNT(DISTINCT user_id) AS mau$window FROM obs GROUP BY 1
       |)
       |SELECT m.event_date, dau.dau, m.mau$window,
       |       CAST(dau.dau AS DOUBLE) / m.mau$window AS stickiness
       |FROM mau m JOIN dau USING (event_date)""".stripMargin

  /** Weekly cohort retention: users grouped by the week of their first
    * event; for each (cohort_week, week_offset) the count of distinct
    * users active that week. Two aggregates keyed by user, then one by
    * (cohort, offset) — standard retention-matrix shape.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(spark, dir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val cohort = weekly.groupBy("user_id").agg(min("wk").as("cohort_week"))
    weekly.join(cohort, "user_id")
      .select(col("cohort_week"),
        expr("CAST(datediff(wk, cohort_week) DIV 7 AS INT)").as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
  }

  val retentionSql: String =
    """WITH weekly AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
      |), cohort AS (
      |  SELECT user_id, min(wk) AS cohort_week FROM weekly GROUP BY 1
      |)
      |SELECT c.cohort_week,
      |       CAST(date_diff('day', c.cohort_week, w.wk) // 7 AS INT) AS week_offset,
      |       count(DISTINCT w.user_id) AS n_users
      |FROM weekly w JOIN cohort c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  val funnelSql: String =
    s"""WITH s1 AS (
      |  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1
      |), s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t AND e.ts <= s1.t + $funnelWindow
      |  GROUP BY 1
      |), s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t AND e.ts <= s2.t + $funnelWindow
      |  GROUP BY 1
      |)
      |SELECT '1_signup' AS step, count(*) AS n_users FROM s1
      |UNION ALL SELECT '2_click', count(*) FROM s2
      |UNION ALL SELECT '3_purchase', count(*) FROM s3""".stripMargin

  /** Calendar gap-fill + forward-fill — the time-series regularization
    * every downstream model/report needs before resampling: per
    * event_type, a dense HOURLY spine from the type's first to last
    * active hour (the grain at which this corpus actually has holes —
    * ~5% of hours are silent per type), missing hours zero-filled and
    * the hourly average value carried forward across the gap.
    *
    * The forward fill is the portable two-step formulation (no
    * IGNORE NULLS dependency): a running COUNT of non-null observations
    * assigns each gap row to the group of its most recent observation,
    * then MAX within (type, group) recovers that observation's value —
    * identical window semantics in both engines.
    *
    * Scale: the spine is |types| × |hours| (generated from a types-sized
    * bounds aggregate, never a per-row explode of raw events); the only
    * raw-event shuffle is the hourly aggregate; both windows partition by
    * event_type over the hour-grain frame. Averages divide a DECIMAL sum
    * so the doubles are bit-identical across engines.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("event_hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
      .withColumn("avg_v", col("sv").cast("double") / col("n"))
    val spine = hourly.groupBy("event_type")
      .agg(min("event_hour").as("h0"), max("event_hour").as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("event_hour"))
    val wRun = Window.partitionBy("event_type").orderBy("event_hour")
    val filled = spine
      .join(hourly.drop("sv"), Seq("event_type", "event_hour"), "left")
      .select(col("event_type"), col("event_hour"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.as("is_gap"),
        col("avg_v"),
        count(col("avg_v")).over(wRun).as("obs_grp"))
    filled
      .withColumn("value_ffill",
        max(col("avg_v")).over(
          Window.partitionBy("event_type", "obs_grp")))
      .select("event_type", "event_hour", "n_events", "is_gap", "value_ffill")
  }

  val gapFillSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS event_hour, event_type, COUNT(*) AS n,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_v
      |  FROM events GROUP BY 1, 2
      |), spine AS (
      |  SELECT event_type,
      |         unnest(generate_series(min(event_hour), max(event_hour),
      |                                INTERVAL 1 HOUR)) AS event_hour
      |  FROM hourly GROUP BY event_type
      |), filled AS (
      |  SELECT s.event_type, s.event_hour,
      |         COALESCE(h.n, 0) AS n_events, h.n IS NULL AS is_gap, h.avg_v,
      |         COUNT(h.avg_v) OVER (PARTITION BY s.event_type
      |                              ORDER BY s.event_hour) AS obs_grp
      |  FROM spine s LEFT JOIN hourly h USING (event_type, event_hour)
      |)
      |SELECT event_type, event_hour, n_events, is_gap,
      |       MAX(avg_v) OVER (PARTITION BY event_type, obs_grp) AS value_ffill
      |FROM filled""".stripMargin

  /** Linear interpolation over the gap-filled hourly series — the
    * resampling rule for a metric that moves BETWEEN observations
    * (forward-fill, [[gapFill]], is right for step-wise state; linear is
    * right for continuous signals). For each gap hour, the value is the
    * time-weighted blend of the previous and next observed averages;
    * leading/trailing gaps degrade to bfill/ffill.
    *
    * Determinism: the observed averages are decimal-sum-derived doubles
    * (the [[gapFill]] property), hour arithmetic is integer epoch
    * micros, and the blend is one fixed expression — bit-identical in
    * both engines; the output lands on the 6-dp decimal grid. Scale
    * shape: same as gapFill — one hourly aggregate, a per-type spine,
    * and four IGNORE-NULLS windows over calendar-bounded series.
    */
  def interpolate(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("event_hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
      .withColumn("avg_v", col("sv").cast("double") / col("n"))
    val spine = hourly.groupBy("event_type")
      .agg(min("event_hour").as("h0"), max("event_hour").as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("event_hour"))
    val ord = Window.partitionBy("event_type").orderBy("event_hour")
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val us = unix_micros(col("event_hour"))
    val obsHour = when(col("avg_v").isNotNull, us)
    val filled = spine
      .join(hourly.drop("sv"), Seq("event_type", "event_hour"), "left")
      .select(col("event_type"), col("event_hour"), us.as("h_us"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.as("is_gap"), col("avg_v"),
        last(col("avg_v"), ignoreNulls = true).over(back).as("pv"),
        last(obsHour, ignoreNulls = true).over(back).as("ph"),
        first(col("avg_v"), ignoreNulls = true).over(fwd).as("nv"),
        first(obsHour, ignoreNulls = true).over(fwd).as("nh"))
    val frac = (col("h_us") - col("ph")).cast("double") /
      (col("nh") - col("ph")).cast("double")
    val interp = when(col("pv").isNull, col("nv"))
      .when(col("nv").isNull, col("pv"))
      .when(col("nh") === col("ph"), col("pv"))
      .otherwise(col("pv") + (col("nv") - col("pv")) * frac)
    filled.select(col("event_type"), col("event_hour"),
      col("n_events"), col("is_gap"),
      interp.cast("decimal(18,6)").as("value_interp"))
  }

  val interpolateSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS event_hour, event_type, COUNT(*) AS n,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_v
      |  FROM events GROUP BY 1, 2
      |), spine AS (
      |  SELECT event_type,
      |         unnest(generate_series(min(event_hour), max(event_hour),
      |                                INTERVAL 1 HOUR)) AS event_hour
      |  FROM hourly GROUP BY event_type
      |), filled AS (
      |  SELECT s.event_type, s.event_hour,
      |         epoch_us(s.event_hour) AS h_us,
      |         COALESCE(h.n, 0) AS n_events, h.n IS NULL AS is_gap,
      |         last_value(h.avg_v IGNORE NULLS) OVER (
      |           PARTITION BY s.event_type ORDER BY s.event_hour
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |         last_value(CASE WHEN h.avg_v IS NOT NULL
      |                         THEN epoch_us(s.event_hour) END IGNORE NULLS) OVER (
      |           PARTITION BY s.event_type ORDER BY s.event_hour
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
      |         first_value(h.avg_v IGNORE NULLS) OVER (
      |           PARTITION BY s.event_type ORDER BY s.event_hour
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |         first_value(CASE WHEN h.avg_v IS NOT NULL
      |                          THEN epoch_us(s.event_hour) END IGNORE NULLS) OVER (
      |           PARTITION BY s.event_type ORDER BY s.event_hour
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      |  FROM spine s LEFT JOIN hourly h USING (event_type, event_hour)
      |)
      |SELECT event_type, event_hour, n_events, is_gap,
      |  -- VARCHAR-mediated decimal cast: Spark's double→decimal rounds
      |  -- the SHORTEST decimal representation HALF_UP (BigDecimal via
      |  -- Double.toString), while DuckDB's direct cast rounds the exact
      |  -- binary value — they disagree precisely on true decimal ties
      |  -- (e.g. 17.9728125 at scale 6, which cent-grid averages blended
      |  -- by dyadic hour fractions do produce). Casting through VARCHAR
      |  -- makes DuckDB round the same shortest string the same way.
      |  CAST(CAST(CAST(CAST(CASE
      |    WHEN pv IS NULL THEN nv
      |    WHEN nv IS NULL THEN pv
      |    WHEN nh = ph THEN pv
      |    ELSE pv + (nv - pv) * (CAST(h_us - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
      |  END AS DOUBLE) AS VARCHAR) AS DECIMAL(18,6)) AS DOUBLE) AS value_interp
      |FROM filled""".stripMargin

  /** Interval-union coverage per user: each event opens a fixed
    * `holdSeconds` activity interval; overlapping intervals merge into
    * islands (the classic sweep: a row starts a new island when its
    * start exceeds the running max end of all earlier intervals), and
    * the covered time is the sum of island extents — double-counting-free
    * engagement time, the thing a naive SUM(duration) gets wrong.
    *
    * All arithmetic is in integer epoch MICROseconds (`unix_micros` /
    * `epoch_us`) so sub-second timestamps cannot round apart between
    * engines. Scale: one shuffle on user_id; both windows and the island
    * aggregate are per-user; output is user-grain.
    */
  def coverage(spark: SparkSession, dir: String,
               holdSeconds: Int = 300): DataFrame = {
    val hold = holdSeconds * 1000000L
    val iv = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("s"), col("event_id"))
      .withColumn("e", col("s") + lit(hold))
    val ord = Window.partitionBy("user_id").orderBy("s", "event_id")
    val prevMax = max(col("e")).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val isles = iv
      .withColumn("new_island",
        when(prevMax.isNull || col("s") > prevMax, 1).otherwise(0))
      .withColumn("island",
        sum(col("new_island")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("n"), min("s").as("st"), max("e").as("en"))
    isles.groupBy("user_id")
      .agg(sum("n").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("en") - col("st")).as("covered_us"))
  }

  def coverageSql(holdSeconds: Int = 300): String = {
    val hold = holdSeconds * 1000000L
    s"""WITH iv AS (
       |  SELECT user_id, epoch_us(ts) AS s, event_id,
       |         epoch_us(ts) + $hold AS e
       |  FROM events
       |), marked AS (
       |  SELECT user_id, s, event_id, e,
       |         CASE WHEN s > COALESCE(MAX(e) OVER (
       |                PARTITION BY user_id ORDER BY s, event_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |                -9223372036854775808) THEN 1 ELSE 0 END AS new_island
       |  FROM iv
       |), isl AS (
       |  SELECT user_id, s, e,
       |         SUM(new_island) OVER (PARTITION BY user_id
       |                               ORDER BY s, event_id
       |                               ROWS BETWEEN UNBOUNDED PRECEDING
       |                               AND CURRENT ROW) AS island
       |  FROM marked
       |), grouped AS (
       |  SELECT user_id, island, COUNT(*) AS n, MIN(s) AS st, MAX(e) AS en
       |  FROM isl GROUP BY 1, 2
       |)
       |SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_intervals,
       |       COUNT(*) AS n_islands,
       |       CAST(SUM(en - st) AS BIGINT) AS covered_us
       |FROM grouped GROUP BY 1""".stripMargin
  }
}
