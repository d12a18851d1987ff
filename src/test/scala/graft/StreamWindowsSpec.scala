package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamWindowsSpec extends SparkSpec {

  test("sliding windows: every event lands in exactly window/slide = 4 windows") {
    val r = EventStream.slidingCheck(spark, sf0001).cache()
    val events = Tables.events(spark, sf0001).count()
    assert(r.agg(sum("n_events")).head().getLong(0) === 4 * events)
    // starts sit on the 15-min grid and spans are exactly one hour
    assert(r.filter(unix_micros(col("window_start")) % (15 * 60 * 1000000L) =!= 0).count() === 0)
    assert(r.filter(unix_micros(col("window_end")) - unix_micros(col("window_start"))
      =!= 3600L * 1000000).count() === 0)
    r.unpersist()
  }

  test("session_window: gap-consistent, per-user disjoint, watermark-gated") {
    val r = EventStream.sessionWindowCheck(spark, sf0001).cache()
    assert(r.count() > 0)
    // end = last event + gap → every session spans at least the gap
    assert(r.filter(unix_micros(col("session_end")) - unix_micros(col("session_start"))
      < 30L * 60 * 1000000).count() === 0)
    // emitted sessions are strictly below the end-of-input watermark
    val wmMs = Tables.events(spark, sf0001)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000 - 600000
    assert(r.filter(unix_micros(col("session_end")) / 1000 > wmMs).count() === 0)
    // per user, sessions never overlap (a merge would have fused them)
    val overlaps = r.as("a").join(r.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.session_start") < col("b.session_start") &&
        col("b.session_start") < col("a.session_end"))
    assert(overlaps.count() === 0)
    r.unpersist()
  }
}
