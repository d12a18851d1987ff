package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.io.FsUtil
import graft.ops.Sampling

class FsUtilSpec extends SparkSpec {
  import spark.implicits._

  test("safeReplace swaps content atomically and cleans up tmp/bak") {
    val base = Files.createTempDirectory("fsu").toString
    val path = s"$base/t"
    FsUtil.safeReplace(spark, Seq(1, 2, 3).toDF("v"), path)
    assert(spark.read.parquet(path).count() === 3)
    FsUtil.safeReplace(spark, Seq(4, 5).toDF("v"), path)
    assert(spark.read.parquet(path).as[Int].collect().toSet === Set(4, 5))
    val dir = new java.io.File(base)
    assert(dir.list().toSet === Set("t"), dir.list().mkString(","))
  }

  test("safeReplace recovers from a leftover .bak of a crashed prior run") {
    val base = Files.createTempDirectory("fsu").toString
    val path = s"$base/t"
    Seq(1).toDF("v").write.parquet(s"$path.bak") // simulated crash debris
    Seq(2).toDF("v").write.parquet(path)
    FsUtil.safeReplace(spark, Seq(3).toDF("v"), path)
    assert(spark.read.parquet(path).as[Int].collect().toSeq === Seq(3))
    assert(new java.io.File(base).list().toSet === Set("t"))
  }

  test("compactDir collapses a fragmented dir, content invariant") {
    val base = Files.createTempDirectory("fsu_compact").toString
    val path = s"$base/t"
    spark.range(10000).toDF("v").repartition(48)
      .write.parquet(path)
    val before = spark.read.parquet(path).as[Long].collect().sorted
    val filesBefore = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 48)
    val stats = graft.io.Compact.compactDir(spark, path)
    assert(stats.filesBefore === filesBefore)
    assert(stats.filesAfter < filesBefore / 8,
      s"expected heavy coalescing, got ${stats.filesAfter} files")
    assert(spark.read.parquet(path).as[Long].collect().sorted === before)
    // crash-safe path left no debris
    assert(new java.io.File(base).list().toSet === Set("t"))
  }

  test("hash sampling membership survives repartitioning (unlike sample())") {
    val a = Sampling.split(spark, sf0001)
      .as[(Long, String)].collect().toMap
    val b = Sampling.split(spark, sf0001)
    val reparted = Tables.documents(spark, sf0001).repartition(7)
      .select(col("doc_id"), Sampling.splitCol(col("doc_id")).as("split"))
      .as[(Long, String)].collect().toMap
    assert(reparted === a)
    assert(b.as[(Long, String)].collect().toMap === a)
    // splits roughly proportioned
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(math.abs(frac - 0.9) < 0.05)
  }
}
