package graft

import org.apache.spark.sql.functions._
import graft.plans.MvRewrite

class MvRewriteSpec extends SparkSpec {

  test("MV rewrite: the plain aggregate is served from the rollup parquet") {
    val mvDir = s"/tmp/graft_mv_spec/daily_${Integer.toHexString(sf0001.hashCode)}"
    MvRewrite.materializeAndRegister(spark, sf0001, mvDir)
    val q = MvRewrite.dailyCounts(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv_spec"),
      s"plan still scans events, not the MV:\n$plan")
    assert(!plan.contains("events.parquet"), "plan must not touch events")
    // the rewritten result equals the direct recompute. NB the recompute
    // must KEEP its extra aggregate in the output: an unused sum gets
    // pruned by the optimizer and the pruned plan is then legitimately
    // MV-eligible (the rule composes with column pruning — a feature)
    val direct = Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    val plan2 = direct.queryExecution.executedPlan.toString
    assert(plan2.contains("events.parquet"),
      "a query whose extra aggregate SURVIVES must not be rewritten")
    // driver-side compare so the recompute side provably ran on events
    // (projecting sv away BEFORE execution would re-enable the rewrite)
    val expect = direct.collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val got = q.collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expect)
  }

  test("MV rewrite: path match is exact, not substring containment") {
    val mvDir = s"/tmp/graft_mv_spec/daily_${Integer.toHexString(sf0001.hashCode)}"
    MvRewrite.materializeAndRegister(spark, sf0001, mvDir)
    // a nested copy whose path CONTAINS '<dir>/events.parquet' as a
    // substring must keep scanning its own files, not be served from
    // the MV (the pre-fix containment match would rewrite it)
    val sibling = s"$sf0001/events.parquet"
    val nested = s"/tmp/graft_mv_spec/nest$sf0001/events.parquet"
    spark.read.parquet(sibling).limit(100).write.mode("overwrite").parquet(nested)
    val q = Tables.events(spark, nested.stripSuffix("/events.parquet"))
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains(mvDir) && plan.contains("nest"),
      s"nested-copy aggregate must scan its own files, not the MV:\n$plan")
    MvRewrite.deregister(spark, sf0001)
  }

  test("MV rewrite: check() executes through the MV then detaches the rule") {
    MvRewrite.deregister(spark, sf0001) // normalize earlier tests' leftovers
    val before = spark.experimental.extraOptimizations.length
    val served = MvRewrite.check(spark, sf0001)
    assert(spark.experimental.extraOptimizations.length == before,
      "check() must deregister its rule after executing")
    // and a later identically-shaped query is NOT MV-served
    val later = MvRewrite.dailyCounts(spark, sf0001)
    val plan = later.queryExecution.executedPlan.toString
    assert(plan.contains("events.parquet"),
      s"post-check aggregate must scan events again:\n$plan")
    assert(served.count() == later.count())
  }

  test("incremental MV: fold equals full recompute, versions advance, rule detached") {
    MvRewrite.deregister(spark, sf0001)
    val before = spark.experimental.extraOptimizations.length
    val base = graft.io.FsUtil.stateDir("mv_state", sf0001)
    val served = MvRewrite.incrementalCheck(spark, sf0001)
    assert(spark.experimental.extraOptimizations.length == before,
      "incrementalCheck() must deregister its rule after executing")
    val v0 = graft.io.AtomicPublish.committed(spark, base)
    assert(v0 >= 0)
    // served content equals the plain full recompute
    val expect = MvRewrite.dailyCounts(spark, sf0001).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val got = served.collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    // the committed artifact holds exactly one row per (day, type)
    val state = graft.io.AtomicPublish.read(spark, base, "daily")
    assert(state.select("event_date", "event_type").distinct().count() ===
      state.count())
    assert(state.count() === expect.size)
  }

  test("MV rewrite: filtered aggregates are never rewritten") {
    val mvDir = s"/tmp/graft_mv_spec/daily_${Integer.toHexString(sf0001.hashCode)}"
    MvRewrite.materializeAndRegister(spark, sf0001, mvDir)
    val filtered = Tables.events(spark, sf0001)
      .filter(col("event_type") =!= "click")
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("events.parquet"),
      s"filtered aggregate must scan events, not the MV:\n$plan")
  }
}
