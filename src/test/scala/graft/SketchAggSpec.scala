package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchAggFunctions
import graft.ops.Sketch

/** The TypedImperativeAggregate sketch functions: partial-merge
  * associativity (partitioning invariance), parity with the
  * SQL-composed register/k-min builds, and union-vs-direct equality.
  */
class SketchAggSpec extends SparkSpec {

  private def regFns(): Unit = SketchAggFunctions.register(spark)

  test("hll_sketch registers are invariant to input partitioning") {
    regFns()
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id").cast("string").as("x"))
    def regs(parts: Int) =
      ev.repartition(parts)
        .agg(call_function("hll_sketch", col("x"), lit(8)).as("regs"))
        .head().getSeq[Int](0)
    assert(regs(1) == regs(13))
  }

  test("kmv_sketch k-mins are invariant to input partitioning") {
    regFns()
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id").cast("string").as("x"))
    def mins(parts: Int) =
      ev.repartition(parts)
        .agg(call_function("kmv_sketch", col("x"), lit(64)).as("mins"))
        .head().getSeq[Long](0)
    assert(mins(1) == mins(7))
  }

  test("hll_sketch equals the SQL-composed register build") {
    regFns()
    val ev = Tables.events(spark, sf0001)
      .select(to_date(col("ts")).as("event_date"), col("user_id"))
    // UDAF build: one pass, no distinct
    val udaf = ev.groupBy("event_date")
      .agg(call_function("hll_sketch", col("user_id").cast("string"), lit(8))
        .as("regs"))
      .select(col("event_date"), posexplode(col("regs")).as(Seq("reg", "mj")))
      .filter(col("mj") > 0)
    // expression build (complete arrays carry 0 for untouched registers,
    // the grouped build only materializes touched ones — compare touched)
    val expr = Sketch.dayRegisters(Sketch.dayHashes(ev))
    assert(udaf.exceptAll(expr).isEmpty && expr.exceptAll(udaf).isEmpty)
  }

  test("hll_merge over day states equals a direct whole-range sketch") {
    regFns()
    val ev = Tables.events(spark, sf0001)
      .select(to_date(col("ts")).as("event_date"),
        col("user_id").cast("string").as("x"))
    val day = ev.groupBy("event_date")
      .agg(call_function("hll_sketch", col("x"), lit(8)).as("regs"))
    val merged = day.agg(call_function("hll_merge", col("regs"), lit(8)))
      .head().getSeq[Int](0)
    val direct = ev.agg(call_function("hll_sketch", col("x"), lit(8)))
      .head().getSeq[Int](0)
    assert(merged == direct)
  }

  test("kmv_union over day states equals a direct whole-range sketch") {
    regFns()
    val ev = Tables.events(spark, sf0001)
      .select(to_date(col("ts")).as("event_date"),
        col("user_id").cast("string").as("x"))
    val day = ev.groupBy("event_date")
      .agg(call_function("kmv_sketch", col("x"), lit(64)).as("mins"))
    val merged = day.agg(call_function("kmv_union", col("mins"), lit(64)))
      .head().getSeq[Long](0)
    val direct = ev.agg(call_function("kmv_sketch", col("x"), lit(64)))
      .head().getSeq[Long](0)
    assert(merged == direct)
  }

  test("UDAF-path queries equal the SQL-composed query results") {
    val hllA = Sketch.hllDistinctUsers(spark, sf0001).orderBy("scope").collect()
    val hllB = Sketch.hllDistinctUsersUdaf(spark, sf0001).orderBy("scope").collect()
    assert(hllA.toSeq == hllB.toSeq)
    val kmvA = Sketch.kmvDistinctUsers(spark, sf0001).orderBy("scope").collect()
    val kmvB = Sketch.kmvDistinctUsersUdaf(spark, sf0001).orderBy("scope").collect()
    assert(kmvA.toSeq == kmvB.toSeq)
  }
}
