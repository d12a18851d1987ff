package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomMightContain

class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  private def buildBloom(items: Seq[String]) = {
    val df = items.toDF("s")
    df.stat.bloomFilter("s", items.size.toLong, 0.01)
  }

  test("no false negatives; probe agrees with the driver-side filter") {
    val members = (0 until 500).map(i => s"member_$i")
    val bloom = buildBloom(members)
    val candidates = (members ++ (0 until 500).map(i => s"other_$i")).toDF("s")
    val kept = candidates
      .filter(BloomMightContain.bloomMightContain(spark, col("s"), bloom))
      .as[String].collect().toSet
    assert(members.forall(kept.contains), "a member was dropped (false negative)")
    // and the distributed probe answers exactly as the driver-side API
    val driverSide = (members ++ (0 until 500).map(i => s"other_$i"))
      .filter(bloom.mightContainString).toSet
    assert(kept === driverSide)
    assert(kept.size < 1000, "the filter pruned nothing")
  }

  test("null values filter out; the probe rides whole-stage codegen") {
    val bloom = buildBloom(Seq("x"))
    // parquet-backed so the filter survives to the physical plan (a
    // local relation would be constant-folded at optimization time)
    val src = java.nio.file.Files.createTempDirectory("bloom_cg").toString + "/t"
    Seq(Some("x"), None, Some("y")).toDF("s").write.parquet(src)
    val df = spark.read.parquet(src)
      .filter(BloomMightContain.bloomMightContain(spark, col("s"), bloom))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks the operator as inside a whole-stage
    // codegen span — the probe must not force the Filter out of it
    assert(plan.split("\n").exists(l =>
      l.contains("Filter bloom_might_contain") && l.trim.startsWith("*")),
      s"probe fell off the codegen path:\n$plan")
    val got = df.as[String].collect().toSet
    assert(got.contains("x") && !got.contains(null))
  }

  test("SQL registration rejects a non-literal bloom argument") {
    BloomMightContain.register(spark)
    intercept[Exception] {
      spark.sql("SELECT bloom_might_contain('a', cast('zz' AS STRING))")
        .collect()
    }
  }
}
