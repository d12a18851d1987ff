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
    val v2 = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.description()
    }
    val fileRoots = collectWithSubqueries(plan) {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(v2.nonEmpty, "expected graft-artifact DSv2 scans")
    val base = AnnIndex.baseFor(sf0001)
    v2.foreach { d =>
      assert(d.contains(base), s"serve plan scans outside the index: $d")
      assert(!d.contains("documents.parquet"),
        s"serve plan must not scan the corpus: $d")
    }
    assert(fileRoots.isEmpty,
      s"every artifact read must ride the DSv2 source, found: $fileRoots")
  }

  test("a probe-set IN filter prunes inverted-list files through DSv2") {
    AnnIndex.build(spark, sf0001)
    import org.apache.spark.sql.functions.col
    val assign = AnnIndex.artifact(spark, sf0001, "assignments")
    // probe two lists: the range layout (files partitioned by
    // centroid_id) must let the footer stats drop the other files
    val probes = assign.select("centroid_id").distinct()
      .orderBy("centroid_id").limit(2)
      .collect().map(_.getLong(0)).toSeq
    val q = assign.filter(col("centroid_id").isin(probes: _*))
    val descs = collectWithSubqueries(q.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.description()
    }
    assert(descs.size === 1)
    val FilesRe = ".*files=(\\d+)/(\\d+).*".r
    descs.head match {
      case FilesRe(kept, total) =>
        assert(total.toInt > 1, "layout must spread lists over >1 file")
        assert(kept.toInt < total.toInt,
          s"pushdown must prune files: ${descs.head}")
      case other => fail(s"no file-prune accounting in scan: $other")
    }
    assert(descs.head.contains("In(centroid_id"),
      s"IN filter must be pushed: ${descs.head}")
    // pruning is only an optimization — results must equal the plain
    // parquet read with the same predicate
    val expected = graft.io.AtomicPublish
      .read(spark, AnnIndex.baseFor(sf0001), "assignments")
      .filter(col("centroid_id").isin(probes: _*))
      .collect().map(_.toSeq).toSet
    assert(q.collect().map(_.toSeq).toSet === expected && expected.nonEmpty)
  }

  test("artifacts are SQL-visible via USING graft-artifact") {
    AnnIndex.build(spark, sf0001)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW ann_lists
         |USING `graft-artifact`
         |OPTIONS (base '${AnnIndex.baseFor(sf0001)}',
         |         dataset 'assignments')""".stripMargin)
    val n = spark.sql("SELECT COUNT(*) FROM ann_lists").head().getLong(0)
    val expected = graft.io.AtomicPublish
      .read(spark, AnnIndex.baseFor(sf0001), "assignments").count()
    assert(n === expected && n > 0)
    // column pruning: a single-column projection reads a one-field schema
    val one = spark.sql("SELECT centroid_id FROM ann_lists LIMIT 1")
    assert(one.schema.fieldNames.toSeq === Seq("centroid_id"))
  }

  test("a rebuild publishes the next version atomically") {
    val v0 = graft.io.AtomicPublish.committed(spark, AnnIndex.baseFor(sf0001))
    val v1 = AnnIndex.build(spark, sf0001)
    assert(v1 === v0 + 1)
    // the new version serves identically (the corpus is unchanged)
    assert(AnnIndex.servePlan(spark, sf0001).count() > 0)
  }
}
