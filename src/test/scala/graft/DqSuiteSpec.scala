package graft

import org.apache.spark.sql.functions._
import graft.dq.DqSuite
import graft.pipeline.{Pipeline, Star}

class DqSuiteSpec extends SparkSpec {
  import spark.implicits._

  test("six result rows with reference statuses on the real pipeline") {
    val silver = Pipeline.silver(spark, sf0001).cache()
    val results = DqSuite.run(spark, silver, Star.fact(silver))
      .select("check_type", "status").as[(String, String)].collect().toMap
    assert(results("correctness") === "passed")   // sums identical by construction
    assert(results("completeness") === "passed")  // ~2.3% null user_name ≤ 5%
    assert(results("consistency") === "passed")   // silver repairs dates
    assert(results("uniqueness") === "failed")    // injected duplicates detected
    assert(results("validity") === "passed")      // salary clamped in silver
    assert(results("summary") === "failed")       // any failure fails the run
  }

  test("per-check Try isolation: broken input yields error rows, not a crash (M4)") {
    // fact missing every expected column → all fact-dependent checks error
    val silver = Seq((1, 100.0)).toDF("id", "purchase_amount")
    val brokenFact = Seq((1, 2)).toDF("a", "b")
    val rows = DqSuite.run(spark, silver, brokenFact)
      .select("check_type", "status", "error_message")
      .as[(String, String, String)].collect()
    assert(rows.length === 6)
    val byType = rows.map(r => r._1 -> r._2).toMap
    assert(byType("correctness") === "error")
    assert(byType("uniqueness") === "error")
    assert(rows.filter(_._2 == "error").forall(_._3.startsWith("Error: ")))
    // summary still emitted and counts errors as not-passed
    assert(byType("summary") === "failed")
  }
}
