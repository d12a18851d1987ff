package graft.streaming

import graft.Bcast

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming path for the `events` stream: file source →
  * watermarked tumbling-window aggregation → sink. The reference is
  * batch-only (SURVEY.md §2.10), so this is the forward-looking streaming
  * twin of EventsOps.daily: the same (window, event_type) rollup computed
  * incrementally with late-data handling instead of a full rescan.
  *
  * Scale notes: state is bounded by the watermark (10 min late tolerance);
  * the aggregation state key space is (1h window × event_type) — tiny.
  * On a cluster the file source becomes Kafka with identical plan shape.
  */
object EventStream extends Serializable {

  /** Schema of the DERIVED incremental-input files ([[incrementalInput]]
    * writes them itself, with `ts` as a long of event-time MICROS —
    * exact and independent of how the generator encoded the source).
    * Source-directory streams do NOT use this: their schema is probed
    * from the footer by [[sourceSchema]], because the generator has
    * landed `ts` as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across
    * data drops.
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  private val srcSchemas = scala.collection.concurrent.TrieMap.empty[String, StructType]

  /** Batch-inferred schema of the events files under `dir` (footer-only
    * read, cached per dir+glob). A stream source needs an explicit
    * schema, and it must declare whichever `ts` encoding is actually on
    * disk: TIMESTAMP(NANOS) infers as long under `nanosAsLong`,
    * TIMESTAMP(MICROS) as TIMESTAMP_NTZ — [[graft.Tables.normalizeEventTs]]
    * then maps either to the same micros TIMESTAMP column.
    */
  /** A named table under `dir` is a single FILE in the driver fixtures
    * but a part-file DIRECTORY when written by Spark (`tools/Replicate`
    * scale fixtures). `pathGlobFilter` only matches leaf files, so for
    * the directory layout stream from the subdirectory itself (and drop
    * the glob); for the file layout keep the glob over `dir`.
    */
  private def resolveSource(spark: SparkSession, dir: String,
                            glob: Option[String]): (String, Option[String]) =
    glob match {
      case Some(name) =>
        val p = new org.apache.hadoop.fs.Path(dir, name)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p) && fs.getFileStatus(p).isDirectory) (p.toString, None)
        else (dir, glob)
      case None => (dir, None)
    }

  private def sourceSchema(spark: SparkSession, dir: String,
                           glob: Option[String]): StructType =
    srcSchemas.getOrElseUpdate(glob.fold(dir)(g => s"$dir#$g"), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val r = spark.read
      glob.foreach(g => r.option("pathGlobFilter", g))
      r.parquet(dir).schema
    })

  /** Streaming read of `dir`'s events with `ts` normalized to a micros
    * TIMESTAMP whatever the stored encoding. */
  private[graft] def eventsStream(spark: SparkSession, dir: String,
                                  glob: Option[String] = None,
                                  options: Map[String, String] = Map.empty): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val (srcDir, srcGlob) = resolveSource(spark, dir, glob)
    val reader = spark.readStream.schema(sourceSchema(spark, srcDir, srcGlob))
    srcGlob.foreach(g => reader.option("pathGlobFilter", g))
    options.foreach { case (k, v) => reader.option(k, v) }
    graft.Tables.normalizeEventTs(reader.parquet(srcDir))
  }

  /** Hourly per-type rollup over a streaming read of a parquet directory
    * (`glob` narrows the directory to matching files — the file source
    * rejects a bare file path as its basePath).
    */
  def hourlyCounts(spark: SparkSession, dir: String,
                   glob: Option[String] = None): DataFrame = {
    eventsStream(spark, dir, glob)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // sum DECIMALs, not doubles: micro-batch arrival order must not be
      // able to change the low bits (same discipline as EventsOps.daily)
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Driver-check: run the streaming rollup to completion over the static
    * events file and return the final complete-mode table. The whole
    * directory is one micro-batch, so no row is ever behind the watermark
    * and the result must equal the batch hourly rollup — the oracle is
    * plain GROUP BY date_trunc('hour') SQL. This is the streaming path's
    * oracle-checked equivalence entry (the specs cover incremental /
    * late-data behavior).
    */
  def hourlyCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_hourly", dir, "stream_hourly") {
      val tbl = "stream_hourly_" + java.lang.Integer.toHexString(dir.hashCode)
      val q = runToMemory(spark, dir, tbl, glob = Some("events.parquet"))
      q.stop()
      spark.table(tbl)
    }

  val hourlyCheckSql: String =
    """SELECT date_trunc('hour', ts) AS window_start,
      |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
      |       event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** Run the stream into an in-memory table until all available input is
    * processed; returns the finished query (test/demo harness).
    *
    * SCALE NOTE: complete mode + memory sink re-materializes the ENTIRE
    * result table every micro-batch — correct only for this bounded
    * equivalence proof. The production shape is [[hourlyCounts]] with
    * append/update mode into a real sink (kafka/parquet/delta), where
    * the watermark bounds state to the open windows and each batch
    * emits only finalized/changed rows. Do not copy this harness shape
    * into a long-running job.
    */
  def runToMemory(spark: SparkSession, dir: String, tableName: String,
                  glob: Option[String] = None): StreamingQuery = {
    val q = hourlyCounts(spark, dir, glob).writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q
  }

  /** Stream–static join: enrich the event stream with a batch-derived
    * user-tier dimension (top-quartile spenders = 'high'). The static
    * side is broadcast per micro-batch; no stream state beyond the
    * source offsets — the standard dimension-enrichment shape.
    */
  def enriched(spark: SparkSession, dir: String, userTiers: DataFrame,
               glob: Option[String] = None): DataFrame = {
    eventsStream(spark, dir, glob)
      .join(Bcast.ifBounded(userTiers, Bcast.Linear), Seq("user_id"), "left")
      .withColumn("tier", coalesce(col("tier"), lit("standard")))
  }

  /** Driver-visible stream–static join proof: enrich the event stream
    * with the batch top-10-spender tier dimension, run to completion,
    * and roll up (tier, event_type) counts. Stateless beyond source
    * offsets (the static side is broadcast per micro-batch), so the
    * result equals the batch left join — which is the oracle.
    */
  def enrichCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_enrich", dir, "stream_enrich") {
      val tiers = graft.ops.EventsOps.topUsers(spark, dir)
        .select(col("user_id"), lit("high").as("tier"))
      val tbl = "stream_enrich_" + java.lang.Integer.toHexString(dir.hashCode)
      val q = enriched(spark, dir, tiers, glob = Some("events.parquet"))
        .groupBy("tier", "event_type").agg(count(lit(1)).as("n_events"))
        .writeStream.format("memory").queryName(tbl)
        .outputMode("complete").start()
      q.processAllAvailable()
      q.stop()
      spark.table(tbl)
    }

  def enrichCheckSql: String =
    s"""WITH top AS (${graft.ops.EventsOps.topUsersSql()})
       |SELECT COALESCE(t.tier, 'standard') AS tier, e.event_type,
       |       COUNT(*) AS n_events
       |FROM events e
       |LEFT JOIN (SELECT user_id, 'high' AS tier FROM top) t
       |  USING (user_id)
       |GROUP BY 1, 2""".stripMargin

  /** Streaming exact-dedup: drop events whose `event_id` reappears within
    * the watermark window — the streaming twin of `Dedup.exact`, with
    * state bounded by the watermark instead of the full history.
    */
  /** Driver-visible streaming-dedup proof: double every input row inside
    * the stream (explode over a 2-element array — duplicates land in the
    * same micro-batch, where dedup is unconditional), drop duplicates by
    * event_id within the watermark, run to completion, and aggregate the
    * survivors. The oracle is the batch truth: event_id is unique in the
    * source, so the deduped doubled stream must equal plain events.
    */
  def dedupCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_dedup", dir, "stream_dedup") {
      val tbl = "stream_dedup_" + java.lang.Integer.toHexString(dir.hashCode)
      val doubled = eventsStream(spark, dir, Some("events.parquet"))
        .withColumn("_copy", explode(array(lit(1), lit(2))))
        .drop("_copy")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
      val q = doubled.writeStream.format("memory").queryName(tbl)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      spark.table(tbl).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"))
    }

  val dedupCheckSql: String =
    "SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY 1"

  /** Watermarked stream–stream inner join — the canonical two-stream
    * correlation: each purchase joined to the same user's clicks in the
    * hour before it. Both sides carry a watermark and the join condition
    * bounds `click_ts` to a window around `purchase_ts`, so the state
    * store retains only the trailing hour (+watermark delay) of clicks
    * and purchases per key — O(window × arrival rate), not O(stream).
    * Without the time bound Spark would (rightly) have to keep every
    * click forever.
    */
  def clickPurchaseJoin(spark: SparkSession, dir: String,
                        glob: Option[String] = None): DataFrame = {
    def side(tpe: String, prefix: String): DataFrame = {
      eventsStream(spark, dir, glob)
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${prefix}_id"),
          col("user_id").as(s"${prefix}_user"),
          col("ts").as(s"${prefix}_ts"),
          col("value").as(s"${prefix}_value"))
        .withWatermark(s"${prefix}_ts", "10 minutes")
    }
    side("purchase", "purchase").join(side("click", "click"),
      col("purchase_user") === col("click_user") &&
        col("click_ts") < col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
  }

  /** Driver-visible stream–stream join proof: run [[clickPurchaseJoin]]
    * to completion (one micro-batch — no match can be dropped by the
    * watermark) and roll up the emitted pairs per purchase. Must equal
    * the batch inner join with the same predicate — the oracle.
    */
  def joinCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_join", dir, "stream_join") {
      val tbl = "stream_join_" + java.lang.Integer.toHexString(dir.hashCode)
      val q = clickPurchaseJoin(spark, dir, glob = Some("events.parquet"))
        .writeStream.format("memory").queryName(tbl)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      spark.table(tbl)
        .groupBy(col("purchase_id"), col("purchase_user").as("user_id"),
          col("purchase_ts"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("click_value").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("click_value"))
    }

  val joinCheckSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
      |)
      |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |       COUNT(*) AS n_clicks,
      |       CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
      |FROM p JOIN c ON p.user_id = c.user_id
      |  AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
      |GROUP BY 1, 2, 3""".stripMargin

  /** Stream–stream LEFT OUTER join — the semantics [[joinCheck]]'s inner
    * join cannot show: a click with NO purchase inside its 1 h window
    * must still come out (conversion analysis needs the non-converters),
    * and in a stream that null-extended row can only be emitted once the
    * watermark PROVES no matching purchase can still arrive. Run to
    * completion, the emitted set is therefore exactly:
    *   matched clicks  ∪  unmatched clicks with click_ts + 1 h < final
    * watermark (min of the two sides' own max event times, − 10 min —
    * a watermark node only sees its side's filtered rows); unmatched
    * clicks in the last
    * 70 minutes of the stream stay in state, correctly unemitted — the
    * oracle replays that boundary arithmetic, so the watermark-gated
    * null emission is hash-verified, not asserted. (The no-data
    * micro-batch after the last file is what flushes the evictable
    * unmatched rows — the engine's documented outer-join contract.)
    */
  def joinOuterCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_join_outer", dir, "stream_join_outer") {
      def side(tpe: String, prefix: String): DataFrame =
        eventsStream(spark, dir, Some("events.parquet"))
          .filter(col("event_type") === tpe)
          .select(col("event_id").as(s"${prefix}_id"),
            col("user_id").as(s"${prefix}_user"),
            col("ts").as(s"${prefix}_ts"))
          .withWatermark(s"${prefix}_ts", "10 minutes")
      val tbl = "stream_join_outer_" + java.lang.Integer.toHexString(dir.hashCode)
      val q = side("click", "click").join(side("purchase", "purchase"),
          col("purchase_user") === col("click_user") &&
            col("click_ts") < col("purchase_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
          "leftOuter")
        .writeStream.format("memory").queryName(tbl)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      spark.table(tbl)
        .groupBy(col("click_id"), col("click_user").as("user_id"),
          col("click_ts"))
        .agg(count(col("purchase_id")).as("n_purchases"))
    }

  val joinOuterCheckSql: String =
    """WITH mx AS (
      |  -- the join's eviction watermark is the MIN of the two sides'
      |  -- watermarks, each computed from its own filtered stream's max
      |  -- event time (a watermark node only sees rows that pass its
      |  -- side's filter)
      |  SELECT LEAST(
      |    (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) FROM events
      |      WHERE event_type = 'click'),
      |    (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) FROM events
      |      WHERE event_type = 'purchase')) AS mxus
      |), c AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
      |), p AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |)
      |SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
      |       COUNT(p.event_id) AS n_purchases
      |FROM c
      |LEFT JOIN p ON p.user_id = c.user_id
      |  AND c.ts < p.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      |CROSS JOIN mx
      |GROUP BY 1, 2, 3, mx.mxus
      |HAVING COUNT(p.event_id) > 0
      |    OR epoch_us(CAST(c.ts AS TIMESTAMP)) + 3600000000
      |       < mx.mxus - 600000000""".stripMargin

  def dedupStream(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** `cents` = value cast DECIMAL(18,2)·100, computed by the same Spark
    * cast the batch path uses: summing longs in state is arrival-order
    * independent (a double accumulator's low bits aren't) and lands on
    * the identical cent grid as the oracle's SUM(DECIMAL).
    */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, cents: Long)
  /** start/last are event-time MICROS — java.sql.Timestamp.getTime is
    * millis and silently drops the micros the parquet data carries.
    */
  case class SessionState(start: Long, last: Long, n: Long, cents: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long,
                        session_value: Double)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000 * 1000)
    t.setNanos((us % 1000000).toInt * 1000)
    t
  }

  /** Custom-state streaming sessionization — the
    * `flatMapGroupsWithState` twin of `EventsOps.sessions`: per-user
    * state holds the open session; an event past the gap (or a state
    * timeout at watermark) closes and emits it. State size is O(users),
    * eviction driven by event-time timeout — the canonical unbounded-
    * stream shape the batch lag/running-sum formulation can't express.
    */
  def sessionize(spark: SparkSession, dir: String,
                 gapMinutes: Int = 30,
                 glob: Option[String] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapSec = gapMinutes * 60L

    val events = eventsStream(spark, dir, glob)
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[Event]

    def close(uid: Long, s: SessionState): SessionOut =
      SessionOut(uid, toTs(s.start), toTs(s.last), s.n, s.cents / 100.0)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, batch, state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(close(uid, _)).toSeq
            state.remove()
            out.iterator
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            batch.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val t = micros(e.ts)
              cur match {
                // gap on floored SECONDS — identical to the batch
                // formulation's ts.cast(long) comparison
                case Some(s) if t / 1000000 - s.last / 1000000 > gapSec =>
                  closed ::= close(uid, s)
                  cur = Some(SessionState(t, t, 1, e.cents))
                case Some(s) =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                    cents = s.cents + e.cents))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // evict once the watermark passes the gap after the last
              // event — clamped above the current watermark: for gaps
              // shorter than the watermark delay, last+gap can already be
              // in the past and setTimeoutTimestamp would throw
              val target = s.last / 1000 + gapSec * 1000
              val floor = state.getCurrentWatermarkMs() + 1
              state.setTimeoutTimestamp(math.max(target, floor))
            }
            closed.reverseIterator
          }
      }
      .toDF()
  }

  /** Drive [[sessionize]] over a static directory until exhausted; open
    * sessions at end-of-stream stay in state (append mode only emits
    * closed sessions).
    */
  def sessionizeToMemory(spark: SparkSession, dir: String,
                         tableName: String,
                         glob: Option[String] = None): StreamingQuery = {
    val q = sessionize(spark, dir, glob = glob).writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q
  }

  /** Driver-visible `flatMapGroupsWithState` proof: run [[sessionize]] to
    * completion over the static events file and return the emitted
    * (closed) sessions. Which sessions close is deterministic: the whole
    * file is one micro-batch, so
    *
    *  - every NON-final session per user closes by gap (a successor event
    *    exists in-batch), and
    *  - a user's FINAL session closes by event-time timeout in the
    *    trailing no-data micro-batch iff the end-of-input watermark has
    *    passed its gap deadline: `wm_ms > last_ms + gap`, with
    *    `wm_ms = floor(max_ts_us/1000) − 600 000` (10-min delay) and
    *    `last_ms = floor(last_us/1000)` — exactly the arithmetic
    *    [[sessionize]] hands to `setTimeoutTimestamp`.
    *
    * The oracle replays that rule over the batch sessionization CTEs.
    */
  def sessionsCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_sessions", dir, "stream_sessions") {
      val tbl = "stream_sessions_" + java.lang.Integer.toHexString(dir.hashCode)
      val q = sessionizeToMemory(spark, dir, tbl, glob = Some("events.parquet"))
      q.stop()
      spark.table(tbl)
    }

  def sessionsCheckSql(gapMinutes: Int = 30): String = {
    val gapMs = gapMinutes * 60L * 1000
    s"""WITH sess AS (${graft.ops.EventsOps.sessionsSql(gapMinutes)}),
       |wm AS (
       |  SELECT epoch_us(MAX(CAST(ts AS TIMESTAMP))) // 1000 - 600000 AS wm_ms
       |  FROM events
       |)
       |SELECT user_id, session_start, session_end, n_events, session_value
       |FROM (
       |  SELECT *, MAX(session_seq) OVER (PARTITION BY user_id) AS max_seq
       |  FROM sess
       |), wm
       |WHERE session_seq < max_seq
       |   OR wm_ms > epoch_us(CAST(session_end AS TIMESTAMP)) // 1000 + $gapMs""".stripMargin
  }

  /** Sliding-window rollup — 1 h windows advancing every 15 min, so each
    * event contributes to exactly window/slide = 4 overlapping windows.
    * This is the hopping-window surface the tumbling [[hourlyCounts]]
    * doesn't exercise: state holds 4× the open windows (still
    * time-bounded by the watermark), and the per-event fan-out happens
    * map-side in the window expression, never as a join.
    */
  def slidingCounts(spark: SparkSession, dir: String,
                    glob: Option[String] = None): DataFrame =
    eventsStream(spark, dir, glob)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Run-to-completion equivalence for the sliding window (complete mode:
    * one micro-batch, nothing behind the watermark). The oracle expands
    * each event into its 4 windows on the 15-min epoch grid — the same
    * arithmetic Spark's window expression performs.
    */
  def slidingCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_sliding", dir, "stream_sliding") {
      val tbl = "stream_sliding_" + java.lang.Integer.toHexString(dir.hashCode)
      val q = slidingCounts(spark, dir, glob = Some("events.parquet"))
        .writeStream.format("memory").queryName(tbl)
        .outputMode("complete").start()
      q.processAllAvailable()
      q.stop()
      spark.table(tbl)
    }

  val slidingCheckSql: String =
    """WITH k AS (SELECT unnest(generate_series(0, 3)) AS k),
      |w AS (
      |  SELECT make_timestamp(
      |           (epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) * 900000000
      |           - k.k * 900000000) AS window_start,
      |         event_type, value
      |  FROM events, k
      |)
      |SELECT window_start,
      |       window_start + INTERVAL 1 HOUR AS window_end,
      |       event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM w GROUP BY 1, 2, 3""".stripMargin

  /** Gap sessionization via the BUILT-IN `session_window` aggregate —
    * the declarative twin of the custom [[sessionize]]
    * `flatMapGroupsWithState` path (same 30-min gap-merge semantics:
    * events merge while consecutive gaps are strictly under the gap;
    * the session end is last event + gap). State is managed by the
    * session-window state store with watermark eviction — no
    * user-written state code.
    */
  def sessionWindowCounts(spark: SparkSession, dir: String,
                          glob: Option[String] = None,
                          gapMinutes: Int = 30): DataFrame =
    eventsStream(spark, dir, glob)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Run-to-completion proof for [[sessionWindowCounts]] (append mode —
    * complete is unsupported for session windows). Emission is
    * watermark-gated: only sessions whose end the end-of-input watermark
    * has passed are in the sink; the oracle replays the same lag-based
    * merge (break iff gap ≥ 30 min, Spark's strict-overlap rule) plus
    * the `session_end ≤ wm` emission cut in ms arithmetic.
    *
    * Sink is PARQUET, not memory: emitted sessions are user-session-
    * cardinality, and a memory sink serializes them all to the driver
    * (measured: >1 GiB of task results at the 100× fixture — a harness
    * bottleneck the production sink shape simply doesn't have).
    */
  def sessionWindowCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_session_window", dir, "stream_session_window") {
      val base = graft.io.FsUtil.stateDir("stream", dir) + "/swin"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val q = sessionWindowCounts(spark, dir, glob = Some("events.parquet"))
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      spark.read.parquet(s"$base/out")
    }

  def sessionWindowCheckSql(gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes * 60L * 1000000
    s"""WITH lagged AS (
       |  SELECT user_id, ts, value, event_id,
       |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM events
       |), flagged AS (
       |  SELECT user_id, ts, value, event_id,
       |         CASE WHEN prev_ts IS NULL
       |                OR epoch_us(CAST(ts AS TIMESTAMP))
       |                   - epoch_us(CAST(prev_ts AS TIMESTAMP)) >= $gapUs
       |              THEN 1 ELSE 0 END AS brk
       |  FROM lagged
       |), sess AS (
       |  SELECT user_id, ts, value,
       |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM flagged
       |), agg AS (
       |  SELECT user_id, MIN(ts) AS session_start,
       |         MAX(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
       |         COUNT(*) AS n_events,
       |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
       |  FROM sess GROUP BY user_id, sid
       |), wm AS (
       |  SELECT epoch_us(MAX(CAST(ts AS TIMESTAMP))) // 1000 - 600000 AS wm_ms
       |  FROM events
       |)
       |SELECT user_id, session_start, session_end, n_events, session_value
       |FROM agg, wm
       |WHERE epoch_us(CAST(session_end AS TIMESTAMP)) // 1000 <= wm_ms""".stripMargin
  }

  // ------------------------------------------------------------------
  // Multi-micro-batch watermark proofs. Every check above runs the whole
  // directory as ONE micro-batch, where the watermark can never drop a
  // row — these two split the input across triggers so the watermark
  // demonstrably finalizes windows and drops late data end-to-end.
  // ------------------------------------------------------------------

  /** The deterministic "late" sample: even-id clicks more than 12 h
    * behind the global max event time. When they arrive in the THIRD
    * micro-batch, both stateful-operator watermarks (late-event filter
    * AND eviction) are ≥ 11 h past their windows — unambiguously late.
    *
    * Why a third batch at all: since SPARK-40925, stateful operators
    * filter late input with the PREVIOUS micro-batch's eviction
    * watermark (one batch behind the eviction watermark itself), so data
    * arriving in the batch right after the one that established the
    * watermark is still admitted. main → filler → late gives the
    * late-event filter one batch to catch up.
    */
  private def latePred(maxUs: Long) =
    col("event_type") === "click" && col("event_id") % 2 === 0 &&
      col("ts") < maxUs - 12L * 3600 * 1000000

  private val lateSql: String =
    """SELECT event_id FROM events
      |  WHERE event_type = 'click' AND event_id % 2 = 0
      |    AND epoch_us(CAST(ts AS TIMESTAMP)) <
      |        (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) FROM events) - 43200000000""".stripMargin

  private val incDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Build (once per dir per JVM) the three-file streaming input:
    * `a_main.parquet` = everything except the trailing hour and the late
    * sample; `b_fill.parquet` = the trailing hour (non-empty by
    * construction — it holds the max-ts row); `c_late.parquet` = the
    * late sample. mtimes t, t+60 s, t+120 s — the file source processes
    * oldest-mtime-first, so `maxFilesPerTrigger = 1` yields exactly
    * these three micro-batches in order. Batch 2 establishes the
    * late-event filter at wm(main) ≈ max − 70 min; batch 3's late rows
    * (≥ 11 h older) are dropped on input, and the final eviction
    * watermark is max − 10 min.
    * Bounded driver work: one 1-row max-ts aggregate + three single-file
    * writes (harness construction, same class as the reload checks).
    */
  private[graft] def incrementalInput(spark: SparkSession, dir: String): String =
    incDirs.getOrElseUpdate(dir, {
      // derived files carry ts as long MICROS ([[schema]]) — exact and
      // independent of the source vintage the normalized read absorbs
      val raw = graft.Tables.events(spark, dir)
        .withColumn("ts", unix_micros(col("ts")))
      val maxUs = raw.agg(max("ts")).head().getLong(0)
      val late = latePred(maxUs)
      val fill = !late && col("ts") >= maxUs - 3600L * 1000000
      val base = java.nio.file.Files
        .createTempDirectory("graft_stream_inc").toFile
      base.deleteOnExit()
      val basePath = new org.apache.hadoop.fs.Path(base.getAbsolutePath)
      val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def writeOne(df: DataFrame, name: String, mtime: Long): Unit = {
        val stage = new org.apache.hadoop.fs.Path(basePath, name + ".stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = fs.listStatus(stage).map(_.getPath)
          .find(_.getName.startsWith("part-"))
          .getOrElse(sys.error(s"no part file under $stage"))
        val out = new org.apache.hadoop.fs.Path(basePath, name)
        fs.rename(part, out)
        fs.delete(stage, true)
        fs.setTimes(out, mtime, -1)
      }
      val t0 = System.currentTimeMillis()
      writeOne(raw.filter(!late && !fill), "a_main.parquet", t0)
      writeOne(raw.filter(fill), "b_fill.parquet", t0 + 60000)
      writeOne(raw.filter(late), "c_late.parquet", t0 + 120000)
      base.getAbsolutePath
    })

  /** The hourly rollup over the three-file input, one file per trigger,
    * APPEND mode — the mode where only watermark-finalized windows are
    * ever emitted. Batch 1 (main) runs at watermark 0 and emits nothing;
    * batch 2 (filler) runs at eviction wm = max_ts(main) − 10 min and
    * emits the windows ending before it; batch 3 (late) has BOTH
    * watermarks ≥ 11 h past the late rows' windows, so every late row is
    * dropped on input (`numRowsDroppedByWatermark` > 0), and its
    * eviction wm = global max − 10 min finalizes the rest. The result
    * proves BOTH watermark semantics: old click windows appear with the
    * late sample missing (dropped data), and the trailing windows never
    * appear (not yet finalized).
    */
  def hourlyIncrementalCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_hourly_incremental", dir, "stream_hourly_incremental") {
      val in = incrementalInput(spark, dir)
      val tbl = "stream_hourly_inc_" + java.lang.Integer.toHexString(dir.hashCode)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
        .withColumn("ts", timestamp_micros(col("ts")))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"),
          col("event_type"), col("n_events"), col("total_value"))
        .writeStream.format("memory").queryName(tbl)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      spark.table(tbl)
    }

  /** The exact watermark arithmetic, replayed in SQL: `src` = events
    * minus the late sample (all its rows are dropped in batch 2);
    * `wm_ms` = floor(max event-time µs / 1000) − 600 000 (Spark tracks
    * event-time stats in ms); emitted windows are those with
    * `window_end ≤ wm` (eviction is `end_µs ≤ wm_ms·1000`).
    */
  val hourlyIncrementalCheckSql: String =
    s"""WITH late AS (
       |  $lateSql
       |), src AS (
       |  SELECT * FROM events WHERE event_id NOT IN (SELECT event_id FROM late)
       |), wm AS (
       |  SELECT epoch_us(MAX(CAST(ts AS TIMESTAMP))) // 1000 - 600000 AS wm_ms
       |  FROM src
       |), agg AS (
       |  SELECT date_trunc('hour', ts) AS window_start,
       |         date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       |         event_type, COUNT(*) AS n_events,
       |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       |  FROM src GROUP BY 1, 2, 3
       |)
       |SELECT window_start, window_end, event_type, n_events, total_value
       |FROM agg, wm
       |WHERE epoch_us(CAST(window_end AS TIMESTAMP)) // 1000 <= wm_ms""".stripMargin

  /** [[clickPurchaseJoin]] over the three-file input, one file per
    * trigger: batches 1–2 join main and filler rows and emit every pair
    * (inner joins emit matches immediately; nothing is evicted from
    * state before the filler batch joins against it); batch 3 arrives
    * behind both watermarks, so the late clicks are dropped on input —
    * a late click whose purchase sits in state produces NO pair. The
    * oracle is the batch join over events minus the late sample, and it
    * differs from the full join at every SF (≥ 1 dropped pair), which is
    * exactly the point.
    */
  def joinIncrementalCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_join_incremental", dir, "stream_join_incremental") {
      val in = incrementalInput(spark, dir)
      val tbl = "stream_join_inc_" + java.lang.Integer.toHexString(dir.hashCode)
      def side(tpe: String, prefix: String): DataFrame =
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(in)
          .withColumn("ts", timestamp_micros(col("ts")))
          .filter(col("event_type") === tpe)
          .select(col("event_id").as(s"${prefix}_id"),
            col("user_id").as(s"${prefix}_user"),
            col("ts").as(s"${prefix}_ts"),
            col("value").as(s"${prefix}_value"))
          .withWatermark(s"${prefix}_ts", "10 minutes")
      val joined = side("purchase", "purchase").join(side("click", "click"),
        col("purchase_user") === col("click_user") &&
          col("click_ts") < col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      val q = joined.writeStream.format("memory").queryName(tbl)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      spark.table(tbl)
        .groupBy(col("purchase_id"), col("purchase_user").as("user_id"),
          col("purchase_ts"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("click_value").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("click_value"))
    }

  val joinIncrementalCheckSql: String =
    s"""WITH late AS (
       |  $lateSql
       |), src AS (
       |  SELECT * FROM events WHERE event_id NOT IN (SELECT event_id FROM late)
       |), p AS (
       |  SELECT event_id, user_id, ts FROM src WHERE event_type = 'purchase'
       |), c AS (
       |  SELECT user_id, ts, value FROM src WHERE event_type = 'click'
       |)
       |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       |       COUNT(*) AS n_clicks,
       |       CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
       |FROM p JOIN c ON p.user_id = c.user_id
       |  AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
       |GROUP BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------------
  // Checkpoint recovery: the exactly-once story across query RESTARTS.
  // The incremental proofs above run one continuous query; production
  // streams die and resume. This check runs the hourly rollup to a
  // parquet FILE sink (whose _spark_metadata commit log is what makes
  // file output exactly-once) in three separate query lifetimes over
  // one checkpoint.
  // ------------------------------------------------------------------

  /** The hourly rollup recovered across restarts:
    *
    *  1. Query #1 sees only `a_main.parquet`, runs to completion
    *     (`Trigger.AvailableNow`), and is stopped — a planned "crash"
    *     after which watermark, window state, and the processed-file log
    *     live only in the checkpoint.
    *  2. The filler and late files then arrive; a NEW query object on
    *     the same checkpoint resumes: it must skip the already-processed
    *     main file, restore the watermark (so the late file's rows are
    *     dropped exactly as in the single-lifetime run), and emit only
    *     windows not already committed by query #1.
    *  3. A third lifetime with no new input must commit nothing —
    *     re-emission would duplicate rows in the sink.
    *
    * The final sink contents are read back through the sink's own
    * commit log and must equal [[hourlyIncrementalCheck]]'s oracle —
    * the same answer as the uninterrupted run, through two restarts.
    * Harness cost is bounded: two file copies + three short queries over
    * the same data volume as the single-lifetime check.
    */
  def recoveryCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_recovery", dir, "stream_recovery") {
      import org.apache.spark.sql.streaming.Trigger
      val in = new org.apache.hadoop.fs.Path(incrementalInput(spark, dir))
      val base = java.nio.file.Files
        .createTempDirectory("graft_stream_rec").toFile
      base.deleteOnExit()
      val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val phased = new org.apache.hadoop.fs.Path(base.getAbsolutePath, "in")
      val out = new org.apache.hadoop.fs.Path(base.getAbsolutePath, "out")
      val ck = new org.apache.hadoop.fs.Path(base.getAbsolutePath, "ck")
      fs.mkdirs(phased)
      def arrive(name: String): Unit = { // copy preserving the mtime order
        val src = new org.apache.hadoop.fs.Path(in, name)
        val dst = new org.apache.hadoop.fs.Path(phased, name)
        org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false,
          spark.sparkContext.hadoopConfiguration)
        fs.setTimes(dst, fs.getFileStatus(src).getModificationTime, -1)
      }
      def lifetime(): Unit = {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(phased.toString)
          .withColumn("ts", timestamp_micros(col("ts")))
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("event_type"), col("n_events"), col("total_value"))
          .writeStream.format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", ck.toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      arrive("a_main.parquet")
      lifetime()                                  // query #1: main only, then "crash"
      arrive("b_fill.parquet"); arrive("c_late.parquet")
      lifetime()                                  // query #2: resume, drop late, finalize
      val committed = spark.read.parquet(out.toString).count()
      lifetime()                                  // query #3: nothing new → no dups
      val result = spark.read.parquet(out.toString)
      require(result.count() == committed,
        s"restart with no new input changed the sink: $committed -> ${result.count()}")
      result
    }

  /** Same oracle arithmetic as [[hourlyIncrementalCheckSql]] — recovery
    * must reproduce the uninterrupted run's answer exactly.
    */
  val recoveryCheckSql: String = hourlyIncrementalCheckSql

  // ------------------------------------------------------------------
  // foreachBatch keyed upsert sink: the Kappa-architecture complement
  // to the append-mode proofs above. Append mode DROPS late data behind
  // the watermark; a keyed upsert sink MERGES it — every micro-batch is
  // folded into per-key state, so the final table equals the batch
  // aggregate over ALL input including the late file.
  // ------------------------------------------------------------------

  /** Merge one micro-batch into the versioned keyed state under `base`
    * ([[VersionedState]] carries the commit protocol that makes the
    * sink exactly-once under foreachBatch's at-least-once contract).
    *
    * Scale shape: the per-batch fold is a keyed full-outer join between
    * the existing state and the batch's map-side-combined aggregate —
    * shuffle on user_id only, no event-time state held by Spark, state
    * size O(distinct keys) regardless of stream length.
    */
  private[graft] def upsertBatch(spark: SparkSession, base: org.apache.hadoop.fs.Path,
                                 batch: DataFrame, batchId: Long): Unit =
    VersionedState.fold(spark, base, batchId) { prev =>
      val delta = batch.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
      prev.fold(delta) { p =>
        p.select(col("user_id"), col("n_events").as("pn"), col("total_value").as("pv"))
          .join(delta.select(col("user_id"), col("n_events").as("dn"), col("total_value").as("dv")),
            Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("pn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_events"),
            (coalesce(col("pv"), lit(BigDecimal(0)).cast("decimal(18,2)")) +
              coalesce(col("dv"), lit(BigDecimal(0)).cast("decimal(18,2)")))
              .cast("decimal(18,2)").as("total_value"))
      }
    }

  /** The three-file input streamed one file per trigger through the
    * upsert sink. The late file (batch 3) lands AFTER the other batches
    * established per-user state — and still merges, so the final state
    * equals the plain batch groupBy over the whole events table. After
    * the stream finishes, batch 3 is replayed by hand with the same
    * batchId: the committed marker must not move and no new state
    * version may appear (the sink's idempotence, driver-checked).
    */
  def upsertCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_upsert", dir, "stream_upsert") {
      import org.apache.spark.sql.streaming.Trigger
      val in = incrementalInput(spark, dir)
      val tmpBase = java.nio.file.Files
        .createTempDirectory("graft_stream_upsert").toFile
      tmpBase.deleteOnExit()
      val state = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "state")
      val ck = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "ck")
      val fs = state.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(state)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          upsertBatch(spark, state, batch, batchId)
        }
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      def committed(): Long = {
        val s = fs.open(new org.apache.hadoop.fs.Path(state, "_committed"))
        try s.readLong() finally s.close()
      }
      val lastId = committed()
      val versions = fs.listStatus(state).count(_.getPath.getName.startsWith("v"))
      // replay the final batch verbatim — the sink must refuse to re-fold
      val lastFile = fs.listStatus(new org.apache.hadoop.fs.Path(in))
        .sortBy(_.getModificationTime).last.getPath
      upsertBatch(spark, state, spark.read.schema(schema).parquet(lastFile.toString), lastId)
      require(committed() == lastId &&
        fs.listStatus(state).count(_.getPath.getName.startsWith("v")) == versions,
        "replayed batch mutated the upsert state")
      spark.read.parquet(new org.apache.hadoop.fs.Path(state, s"v$lastId").toString)
        .select("user_id", "n_events", "total_value")
    }

  /** The whole-input batch aggregate — late rows included: the upsert
    * sink merges them instead of dropping them, which is the contrast
    * with [[hourlyIncrementalCheckSql]]'s append-mode arithmetic.
    */
  val upsertCheckSql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1""".stripMargin

  /** Fold one micro-batch's change-log rows into CDC state by
    * latest-wins merge: the batch reduces to one candidate per key with
    * the same map-side `max_by` as [[graft.ops.EventsOps.cdcApply]],
    * then a keyed full-outer join against state keeps whichever side's
    * (ts, event_id) order key is larger, summing the change counts.
    * Tombstones STAY in state (a 'D' must keep winning over earlier
    * U/I rows replayed or arriving late) and are dropped only at read
    * time — the standard compaction rule for log-structured merge.
    * State is O(keys); per batch one batch aggregate + one state-sized
    * join.
    */
  private[graft] def cdcBatch(spark: SparkSession,
                              base: org.apache.hadoop.fs.Path,
                              batch: DataFrame, batchId: Long): Unit =
    VersionedState.fold(spark, base, batchId) { prev =>
      val op = when(col("event_type") === "signup", "I")
        .when(col("event_type") === "error", "D").otherwise("U")
      val delta = batch
        .withColumn("ts", timestamp_micros(col("ts")))
        .select(col("user_id"), col("event_id"), col("ts"), op.as("op"), col("value"))
        .groupBy("user_id")
        .agg(expr("max_by(named_struct('op', op, 'ts', ts, 'value', value," +
          " 'eid', event_id), named_struct('ts', ts, 'eid', event_id))").as("last"),
          count(lit(1)).as("n_changes"))
        .select(col("user_id"), col("last.op").as("op"), col("last.ts").as("ts"),
          col("last.value").as("value"), col("last.eid").as("eid"),
          col("n_changes"))
      prev.fold(delta) { p =>
        val pr = p.select(col("user_id"), struct(col("op"), col("ts"),
          col("value"), col("eid")).as("pl"), col("n_changes").as("pn"))
        val dr = delta.select(col("user_id"), struct(col("op"), col("ts"),
          col("value"), col("eid")).as("dl"), col("n_changes").as("dn"))
        pr.join(dr, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            when(col("dl").isNull, col("pl"))
              .when(col("pl").isNull, col("dl"))
              .when(struct(col("dl.ts"), col("dl.eid")) >
                struct(col("pl.ts"), col("pl.eid")), col("dl"))
              .otherwise(col("pl")).as("w"),
            (coalesce(col("pn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n_changes"))
          .select(col("user_id"), col("w.op").as("op"), col("w.ts").as("ts"),
            col("w.value").as("value"), col("w.eid").as("eid"), col("n_changes"))
      }
    }

  /** The three-file input streamed one file per trigger through the CDC
    * fold; the late file still merges (its rows carry older order keys,
    * so they only win where state has nothing newer — exactly
    * latest-wins). After replaying the final batch (state must hold
    * still), tombstoned keys are dropped at read time and the state
    * must equal the BATCH [[graft.ops.EventsOps.cdcApplySql]] oracle
    * verbatim — arrival order and batch boundaries invisible.
    */
  def cdcStreamCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_cdc", dir, "stream_cdc") {
      import org.apache.spark.sql.streaming.Trigger
      val in = incrementalInput(spark, dir)
      val tmpBase = java.nio.file.Files
        .createTempDirectory("graft_stream_cdc").toFile
      tmpBase.deleteOnExit()
      val state = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "state")
      val ck = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "ck")
      val fs = state.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(state)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          cdcBatch(spark, state, batch, batchId)
        }
        .option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      def committed(): Long = {
        val s = fs.open(new org.apache.hadoop.fs.Path(state, "_committed"))
        try s.readLong() finally s.close()
      }
      val lastId = committed()
      val versions = fs.listStatus(state).count(_.getPath.getName.startsWith("v"))
      val lastFile = fs.listStatus(new org.apache.hadoop.fs.Path(in))
        .sortBy(_.getModificationTime).last.getPath
      cdcBatch(spark, state, spark.read.schema(schema).parquet(lastFile.toString), lastId)
      require(committed() == lastId &&
        fs.listStatus(state).count(_.getPath.getName.startsWith("v")) == versions,
        "replayed batch mutated the CDC state")
      spark.read.parquet(new org.apache.hadoop.fs.Path(state, s"v$lastId").toString)
        .filter(col("op") =!= "D")
        .select(col("user_id"), col("op").as("last_op"), col("ts").as("last_ts"),
          col("value").cast("decimal(18,2)").as("last_value"), col("n_changes"))
    }

  /** Fold one micro-batch's HLL register deltas into versioned state by
    * element-wise MAX — the streaming materialization of the sketch's
    * algebraic merge ([[graft.ops.Sketch.hllOf]]). State size is bounded
    * at days × 2^b registers no matter how long the stream runs — the
    * property that makes sketches THE answer to streaming distinct
    * counts (exact streaming distinct state grows with key cardinality,
    * cf. the externalized fingerprint table in
    * [[DocStream.dedupBatch]]). Max-merge is idempotent per key, so a
    * replayed batch could not corrupt state even without the batchId
    * guard — the guard still applies, as for every sink sharing
    * [[VersionedState]].
    */
  private[graft] def hllBatch(spark: SparkSession,
                              base: org.apache.hadoop.fs.Path,
                              batch: DataFrame, batchId: Long): Unit =
    VersionedState.fold(spark, base, batchId) { prev =>
      val delta = graft.ops.Sketch.dayRegisters(graft.ops.Sketch.dayHashes(
        batch.select(to_date(timestamp_micros(col("ts"))).as("event_date"),
          col("user_id"))))
      prev.fold(delta)(p => p.unionByName(delta)
        .groupBy("event_date", "reg").agg(max("mj").as("mj")))
    }

  /** The three-file input streamed one file per trigger through the HLL
    * register fold; after replaying the final batch (state must hold
    * still), the folded registers are rolled up to the per-day +
    * whole-range estimates. The oracle is the BATCH sketch SQL verbatim
    * ([[graft.ops.Sketch.hllDistinctUsersSql]]): arrival order, batch
    * boundaries, and the streaming machinery must all be invisible in
    * the estimates — the definition of a mergeable sketch. (The exact
    * ground-truth columns beside the estimates come from the static
    * table, as in the batch query; only the registers are streamed
    * state.)
    */
  def hllStreamCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_hll", dir, "stream_hll") {
      val reg = foldedState(spark, dir, "hll")(hllBatch(spark, _, _, _))
      val dh = graft.ops.Sketch.dayHashes(graft.Tables.events(spark, dir)
        .select(to_date(col("ts")).as("event_date"), col("user_id")))
      graft.ops.Sketch.hllEstimates(reg, dh)
    }

  /** Shared harness of the [[VersionedState]]-fold stream checks (HLL /
    * quantile-anchor / daily-count): streams the three-file input one
    * file per trigger through `foldBatch`, then REPLAYS the final batch
    * and asserts the state held still (the batchId guard makes every
    * fold idempotent under foreachBatch's at-least-once contract — each
    * check proves it, not just claims it). Returns the final folded
    * state.
    */
  private def foldedState(spark: SparkSession, dir: String, tag: String)
      (foldBatch: (org.apache.hadoop.fs.Path, DataFrame, Long) => Unit): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val in = incrementalInput(spark, dir)
    val tmpBase = java.nio.file.Files
      .createTempDirectory(s"graft_stream_$tag").toFile
    tmpBase.deleteOnExit()
    val state = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "state")
    val ck = new org.apache.hadoop.fs.Path(tmpBase.getAbsolutePath, "ck")
    val fs = state.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(state)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(state, batch, batchId)
      }
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val lastId = VersionedState.committed(spark, state)
    val versions = fs.listStatus(state).count(_.getPath.getName.startsWith("v"))
    val lastFile = fs.listStatus(new org.apache.hadoop.fs.Path(in))
      .sortBy(_.getModificationTime).last.getPath
    foldBatch(state, spark.read.schema(schema).parquet(lastFile.toString), lastId)
    require(VersionedState.committed(spark, state) == lastId &&
      fs.listStatus(state).count(_.getPath.getName.startsWith("v")) == versions,
      "replayed batch mutated the folded state")
    spark.read.parquet(new org.apache.hadoop.fs.Path(state, s"v$lastId").toString)
  }

  /** Per-batch quantile-summary fold: the batch's ≤ k+1 weighted anchors
    * per (type, day, delivery) group are APPENDED to the anchor state —
    * union IS the merge for this summary family (each group's n and step
    * are recoverable from its own anchors), so unlike the HLL max-merge
    * no cross-batch recombination happens at fold time; the weighted
    * union is deferred to the final estimate. The `delivery` tag (the
    * batchId) keeps the merge ordering total and the state grain
    * explicit; the batchId guard in [[VersionedState.fold]] makes a
    * replayed append impossible, which the check asserts.
    */
  private[graft] def quantBatch(spark: SparkSession,
                                base: org.apache.hadoop.fs.Path,
                                batch: DataFrame, batchId: Long): Unit =
    VersionedState.fold(spark, base, batchId) { prev =>
      val delta = graft.ops.Sketch.quantAnchors(
        batch.select(col("event_type"),
          to_date(timestamp_micros(col("ts"))).as("event_date"),
          col("value"), col("event_id"))
          .withColumn("delivery", lit(batchId)),
        16, Seq("event_type", "event_date", "delivery"))
      prev.fold(delta)(_.unionByName(delta))
    }

  /** The three-file input streamed one file per trigger through the
    * quantile-anchor fold; after replaying the final batch (state must
    * hold still), the folded anchors are weighted-union merged into
    * p50/p95/p99 estimates with the Σ-step rank-error bound and the
    * exact one-scan confirm — the streaming companion of
    * [[graft.ops.Sketch.quantileSketch]]. The summary grain is one
    * level finer than the batch sketch ((type, day, DELIVERY) vs
    * (type, day)) because a day split across deliveries contributes one
    * summary per delivery — the err_bound grows by exactly those extra
    * groups' steps and the oracle replays the same grain, so arrival
    * order and batch boundaries remain fully deterministic in the
    * result. State is ≤ groups×(k+1) anchor rows regardless of row
    * volume — the whole point of folding a mergeable sketch instead of
    * the raw stream.
    */
  def quantStreamCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_quantiles", dir, "stream_quantiles") {
      val anchors = foldedState(spark, dir, "quant")(quantBatch(spark, _, _, _))
      graft.ops.Sketch.quantMergeConfirm(anchors,
        graft.Tables.events(spark, dir).select(col("event_type"), col("value")),
        Seq("event_type", "event_date", "delivery"))
    }

  /** Per-batch daily-count fold for the streaming anomaly detector:
    * state is the (event_type, event_date) count table — counts
    * sum-merge exactly (unlike distinct counts, cf.
    * [[graft.ops.EventsOps.dailyIncremental]]'s grain argument), so the
    * folded state equals the batch rollup REGARDLESS of how rows were
    * split across deliveries, and the anomaly statistics computed from
    * it are the batch detector's verbatim.
    */
  private[graft] def anomBatch(spark: SparkSession,
                               base: org.apache.hadoop.fs.Path,
                               batch: DataFrame, batchId: Long): Unit =
    VersionedState.fold(spark, base, batchId) { prev =>
      val delta = batch
        .groupBy(col("event_type"),
          to_date(timestamp_micros(col("ts"))).as("event_date"))
        .agg(count(lit(1)).as("n"))
      prev.fold(delta)(p => p.unionByName(delta)
        .groupBy("event_type", "event_date").agg(sum("n").as("n")))
    }

  /** Streaming anomaly detection: the three-file input folds into the
    * per-day count state, and the z-score detector runs over the FOLDED
    * STATE ONLY — no history rescan, which is how a production monitor
    * watches a stream (state is types×days rows however large the
    * stream). Batch boundaries must be invisible: the oracle is the
    * batch [[graft.ops.EventsOps.dailyAnomalies]] SQL verbatim, and the
    * replayed-final-batch assertion proves the fold is idempotent.
    */
  def anomalyStreamCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_anomaly", dir, "stream_anomaly") {
      val daily = foldedState(spark, dir, "anom")(anomBatch(spark, _, _, _))
      // the batch detector's statistics, computed from state alone
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

  /** Oracle: the batch sketch replay at the (type, day, delivery) grain,
    * with delivery re-derived from the SAME split arithmetic that built
    * the three input files (late / last-hour-fill / main — batchIds 2/1/0
    * in modification-time order).
    */
  def streamQuantilesSql(k: Int = 16): String =
    graft.ops.Sketch.quantSketchSqlOf(k, grain = ", delivery",
      source = "delivered",
      prelude =
        """delivered AS (
          |  SELECT event_type, ts, value, event_id,
          |         CASE WHEN event_type = 'click' AND event_id % 2 = 0
          |                   AND epoch_us(CAST(ts AS TIMESTAMP)) < m.mx - 43200000000
          |              THEN CAST(2 AS BIGINT)
          |              WHEN epoch_us(CAST(ts AS TIMESTAMP)) >= m.mx - 3600000000
          |              THEN CAST(1 AS BIGINT)
          |              ELSE CAST(0 AS BIGINT) END AS delivery
          |  FROM events,
          |       (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS mx FROM events) m
          |),""".stripMargin)
}
