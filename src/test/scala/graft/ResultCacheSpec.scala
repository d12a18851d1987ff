package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.io.ResultCache

class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("miss then hit; the hit path scans only the cache entry") {
    val src = tmp("rc_src") + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
      .write.parquet(src)
    val cacheDir = tmp("rc_cache")
    def q = spark.read.parquet(src).groupBy("k").agg(count(lit(1)).as("n"))
    val (first, hit1) = ResultCache.serve(spark, cacheDir)(q)
    assert(!hit1)
    val (second, hit2) = ResultCache.serve(spark, cacheDir)(q)
    assert(hit2)
    // the served frame reads the stored result, not the source table
    assert(second.inputFiles.nonEmpty &&
      second.inputFiles.forall(_.contains(cacheDir)))
    assert(second.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === first.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(second.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("a" -> 2L, "b" -> 1L))
  }

  test("alias renames don't change the fingerprint; predicates do") {
    val src = tmp("rc_fp") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "k").write.parquet(src)
    val base = spark.read.parquet(src).groupBy("k")
      .agg(count(lit(1)).as("n"))
    val renamed = spark.read.parquet(src).groupBy("k")
      .agg(count(lit(1)).as("totally_different_alias"))
    // canonicalization normalizes names/expr ids: same plan, same entry
    assert(ResultCache.fingerprint(base) === ResultCache.fingerprint(renamed))
    val filtered = spark.read.parquet(src).filter(col("id") > 1)
      .groupBy("k").agg(count(lit(1)).as("n"))
    assert(ResultCache.fingerprint(base) !== ResultCache.fingerprint(filtered))
  }

  test("rewriting a source file invalidates the entry structurally") {
    val src = tmp("rc_inv") + "/t"
    Seq((1L, "a")).toDF("id", "k").write.parquet(src)
    val cacheDir = tmp("rc_inv_cache")
    def q = spark.read.parquet(src).groupBy("k").agg(count(lit(1)).as("n"))
    ResultCache.serve(spark, cacheDir)(q)
    // the data changes underneath: stale serving would be a wrong result
    Seq((1L, "a"), (2L, "a")).toDF("id", "k")
      .write.mode("overwrite").parquet(src)
    val (served, hit) = ResultCache.serve(spark, cacheDir)(
      spark.read.parquet(src).groupBy("k").agg(count(lit(1)).as("n")))
    assert(!hit, "a rewritten source must miss, never serve stale rows")
    assert(served.head().getLong(1) === 2L)
  }
}
