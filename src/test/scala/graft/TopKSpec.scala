package graft

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{TopK, TopKPerKeyExec}

class TopKSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def events = Tables.events(spark, sf0001)
    .select("event_id", "ts", "user_id", "event_type", "value")

  test("native top-k matches the window row_number formulation exactly") {
    val native = TopK.perKey(spark, events, Seq("user_id"),
      Seq("ts" -> false, "event_id" -> false), 3)
      .select("event_id", "user_id").as[(Long, Long)].collect().toSet
    val window = events
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rk") <= 3)
      .select("event_id", "user_id").as[(Long, Long)].collect().toSet
    assert(native === window)
    assert(native.nonEmpty)
  }

  test("physical plan uses TopKPerKeyExec and no sort") {
    val df = TopK.perKey(spark, events, Seq("user_id"),
      Seq("ts" -> false, "event_id" -> false), 3)
    df.collect() // finalize any adaptive plan
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: TopKPerKeyExec => e }.nonEmpty,
      plan.treeString)
    assert(collectWithSubqueries(plan) { case s: SortExec => s }.isEmpty,
      s"native top-k must not sort:\n${plan.treeString}")
  }

  test("rewrite rule: window row_number filter plans through TopKPerKeyExec") {
    graft.plans.TopKRewrite.register(spark)
    val df = events
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rk") <= 3)
    val rows = df.select("event_id", "user_id", "rk")
      .as[(Long, Long, Int)].collect().toSet
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: TopKPerKeyExec => e }.nonEmpty,
      s"rule did not fire:\n${df.queryExecution.optimizedPlan.treeString}")

    // ranks and rows must be identical to the unrewritten formulation
    val spark2 = spark.newSession()
    val plain = Tables.events(spark2, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rk") <= 3)
      .select("event_id", "user_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows === plain)
  }

  test("ascending order and k larger than group size work") {
    val df = Seq((1, 10), (1, 20), (1, 30), (2, 5)).toDF("k", "v")
    val got = TopK.perKey(spark, df, Seq("k"), Seq("v" -> true), 2)
      .as[(Int, Int)].collect().toSet
    assert(got === Set((1, 10), (1, 20), (2, 5)))
  }
}
