package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Multi-micro-batch watermark proofs: the incremental harnesses must
  * demonstrate watermark semantics, not merely equal the batch result —
  * late rows dropped (day-old clicks arriving in the third micro-batch)
  * and trailing windows withheld (not yet finalized at end of input).
  */
class StreamIncrementalSpec extends SparkSpec {

  test("incremental hourly rollup drops late rows and withholds open windows") {
    val inc = EventStream.hourlyIncrementalCheck(spark, sf0001)
    val full = Tables.events(spark, sf0001)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n_events"))

    // at least one trailing window withheld: the full rollup has groups
    // past the final watermark that the incremental run never emitted
    val maxEnd = full.agg(max("window_end")).head().getTimestamp(0)
    assert(inc.filter(col("window_end") === maxEnd).count() === 0,
      "the window containing the max event time can never be finalized")
    assert(inc.count() < full.count())

    // at least one late row dropped: some emitted (window, type) group
    // has FEWER events than the full rollup — the late click sample is
    // missing from finalized windows, not merely deferred
    val fewer = inc.as("i")
      .join(full.as("f"), Seq("window_start", "event_type"))
      .filter(col("i.n_events") < col("f.n_events"))
    assert(fewer.count() > 0, "no window lost its late rows")

    // and nothing was invented: every emitted group is ≤ its batch twin
    val more = inc.as("i")
      .join(full.as("f"), Seq("window_start", "event_type"), "left")
      .filter(col("f.n_events").isNull || col("i.n_events") > col("f.n_events"))
    assert(more.count() === 0)
  }

  test("upsert sink merges the late batch and equals the whole-input aggregate") {
    val got = EventStream.upsertCheck(spark, sf0001)
    val expected = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
    // the upsert sink is late-tolerant: unlike the append-mode rollup it
    // must NOT lose the late file's rows — exact equality with batch
    assert(got.count() === expected.count())
    val diverged = got.as("g").join(expected.as("e"), Seq("user_id"), "full_outer")
      .filter(col("g.n_events") =!= col("e.n_events") ||
        col("g.total_value") =!= col("e.total_value") ||
        col("g.n_events").isNull || col("e.n_events").isNull)
    assert(diverged.count() === 0)
  }

  test("incremental stream-stream join drops at least one late-click pair") {
    val inc = EventStream.joinIncrementalCheck(spark, sf0001)
    val full = EventStream.joinCheck(spark, sf0001)
    val incClicks = inc.agg(sum("n_clicks")).head().getLong(0)
    val fullClicks = full.agg(sum("n_clicks")).head().getLong(0)
    assert(incClicks < fullClicks,
      s"no pair was dropped (incremental $incClicks vs full $fullClicks)")
    // dropped pairs only ever REMOVE clicks from a purchase, never add
    val more = inc.as("i")
      .join(full.as("f"), Seq("purchase_id"), "left")
      .filter(col("f.n_clicks").isNull || col("i.n_clicks") > col("f.n_clicks"))
    assert(more.count() === 0)
  }
}
