package graft

import org.apache.spark.sql.functions._
import graft.ops.TableProfile

class TableProfileSpec extends SparkSpec {

  test("column profile: one row per column with reconciling statistics") {
    val p = TableProfile.events(spark, sf0001).cache()
    val rows = p.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    val ev = Tables.events(spark, sf0001).cache()
    val n = ev.count()
    // every row carries the table cardinality; bounds hold per column
    rows.values.foreach { r =>
      assert(r.getLong(1) === n)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= n)           // nulls
      assert(r.getLong(3) >= 0 && r.getLong(3) <= n)           // distinct
      assert(r.getLong(2) + r.getLong(3) <= n + 1)             // nulls + distinct sane
    }
    // spot-check against direct recomputation
    assert(rows("event_id").getLong(3) === ev.select("event_id").distinct().count())
    assert(rows("event_type").getLong(3) === ev.select("event_type").distinct().count())
    val (vMin, vMax) = {
      val r = ev.agg(min("value"), max("value")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    assert(rows("value").getDouble(4) === vMin && rows("value").getDouble(5) === vMax)
    // numeric columns keep the string lane null and vice versa
    assert(rows("value").isNullAt(6) && rows("value").isNullAt(7))
    assert(rows("event_type").isNullAt(4) && rows("event_type").isNullAt(5))
    assert(rows("event_type").getString(6) <= rows("event_type").getString(7))
    ev.unpersist(); p.unpersist()
  }
}
