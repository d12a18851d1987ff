package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.ops.{AnnIndex, Featurize, Pq}

/** The persisted-index contract: serving equals the in-session build
  * bit-for-bit while its plan scans ONLY the index artifacts.
  */
class AnnIndexSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("served top-k equals the in-session IVF-PQ result") {
    AnnIndex.build(spark, sf0001)
    val served = AnnIndex.servePlan(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val inSession = Pq.ivfPqTopK(spark, sf0001,
      queryMod = AnnIndex.queryMod, corpus = Featurize.corpus)
      .collect().map(_.toSeq).toSet
    assert(served === inSession)
    assert(served.nonEmpty)
  }

  test("the serve plan scans only the index directory — no corpus reads") {
    AnnIndex.build(spark, sf0001)
    val plan = AnnIndex.servePlan(spark, sf0001).queryExecution.executedPlan
    val roots = collectWithSubqueries(plan) {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(roots.nonEmpty, "expected file scans")
    val base = AnnIndex.baseFor(sf0001)
    roots.foreach { p =>
      // rootPaths render with a scheme ("file:/tmp/…") — compare on the
      // path suffix
      assert(p.contains(base), s"serve plan scans outside the index: $p")
      assert(!p.contains("documents.parquet"),
        s"serve plan must not scan the corpus: $p")
    }
  }

  test("a rebuild publishes the next version atomically") {
    val v0 = graft.io.AtomicPublish.committed(spark, AnnIndex.baseFor(sf0001))
    val v1 = AnnIndex.build(spark, sf0001)
    assert(v1 === v0 + 1)
    // the new version serves identically (the corpus is unchanged)
    assert(AnnIndex.servePlan(spark, sf0001).count() > 0)
  }
}
