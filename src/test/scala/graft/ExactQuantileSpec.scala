package graft

import org.apache.spark.sql.functions._
import graft.ops.ExactQuantile

class ExactQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("selection median equals the sort-based recompute per group") {
    val got = ExactQuantile.exactMedian(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val byType = Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select("event_type", "value").as[(String, Double)]
      .collect().groupBy(_._1)
    assert(got.keySet === byType.keySet)
    byType.foreach { case (t, rows) =>
      val vs = rows.map(_._2).sorted
      val want = vs((vs.length + 1) / 2 - 1) // lower median, 1-based (n+1)/2
      assert(got(t) === ((vs.length.toLong, want)), s"median mismatch for $t")
    }
  }

  test("multi-quantile selection equals the sort-based recompute at every pct") {
    val got = ExactQuantile.exactQuantiles(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val byType = Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select("event_type", "value").as[(String, Double)]
      .collect().groupBy(_._1)
    for ((t, rows) <- byType; pct <- Seq(50, 95, 99)) {
      val vs = rows.map(_._2).sorted
      val want = vs(((vs.length.toLong * pct + 99) / 100).toInt - 1)
      assert(got((t, pct)) === want, s"($t, p$pct) mismatch")
    }
    assert(got.size === byType.size * 3)
  }

  test("pathological concentration never piles rows into one sorted partition") {
    // all-equal values: the histogram degenerates to one bin, but pass 3
    // groups by DISTINCT value — one row per group, and the answer is exact
    val src = java.nio.file.Files.createTempDirectory("eq_med").toString
    (1 to 10000).map(i => (i.toLong,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      i.toLong % 7, "burst", 42.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$src/events.parquet")
    val r = ExactQuantile.exactMedian(spark, src).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 10000L && r.head.getDouble(2) === 42.0)
  }
}
