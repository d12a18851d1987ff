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

  test("approx profile: no Expand in the plan, estimates inside the HLL band") {
    val approx = TableProfile.eventsApprox(spark, sf0001)
    // the exact tier pays a 6-way Expand for the multi-distinct; the
    // sketch tier must not — that IS the scale claim
    val exactPlan = TableProfile.events(spark, sf0001)
      .queryExecution.executedPlan.toString
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact tier baseline should Expand")
    assert(!approxPlan.contains("Expand"),
      s"approx tier must not Expand:\n$approxPlan")
    // estimates track the exact distincts within HLL's 3σ band (b = 8);
    // `value` is micro-quantized before hashing, so compare against the
    // quantized distinct count
    val exact = Tables.events(spark, sf0001).agg(
      countDistinct(col("event_id")).as("event_id"),
      countDistinct(col("user_id")).as("user_id"),
      countDistinct(col("event_type")).as("event_type"),
      countDistinct(round(col("value") * lit(1e6)).cast("long")).as("value"))
      .head()
    val est = approx.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val bound = 3.0 * 1.04 / math.sqrt(256)
    Seq("event_id", "user_id", "event_type", "value").zipWithIndex.foreach {
      case (name, i) =>
        val ex = exact.getLong(i).toDouble
        assert(math.abs(est(name) - ex) / ex <= bound,
          s"$name: est ${est(name)} vs exact $ex exceeds $bound")
    }
  }
}
