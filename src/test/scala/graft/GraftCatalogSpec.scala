package graft

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.io.CowTable

/** SQL DML against cow tables through the V2 GraftCatalog: DELETE FROM
  * routes into the stats-pruned copy-on-write delete, INSERT INTO
  * appends pool files, SELECT serves the DV-aware manifest scan.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft",
    classOf[graft.sources.GraftCatalog].getName)

  private def table(n: Int) =
    (1 to n).map(i => (i.toLong, s"name$i", i * 10.0)).toDF("id", "nm", "amt")

  test("DELETE FROM … WHERE routes through SupportsDelete") {
    val base = Files.createTempDirectory("gcat_del").toString + "/t"
    CowTable.create(spark, base, table(100), "id", numFiles = 4)
    spark.sql(s"DELETE FROM graft.`$base` WHERE id <= 25 AND amt < 10000.0")
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$base`")
      .head().getLong(0) === 75L)
    assert(CowTable.read(spark, base).filter(col("id") <= 25).count() === 0L)
  }

  test("an untranslatable DELETE predicate is refused, not half-applied") {
    val base = Files.createTempDirectory("gcat_bad").toString + "/t"
    CowTable.create(spark, base, table(10), "id", numFiles = 1)
    intercept[AnalysisException] {
      spark.sql(s"DELETE FROM graft.`$base` WHERE length(nm) > 90")
    }
    assert(CowTable.read(spark, base).count() === 10L, "nothing deleted")
  }

  test("INSERT INTO appends; INSERT OVERWRITE is refused") {
    val base = Files.createTempDirectory("gcat_ins").toString + "/t"
    CowTable.create(spark, base, table(10), "id", numFiles = 1)
    val before = CowTable.manifest(spark, base).map(_.file).toSet
    spark.sql(s"INSERT INTO graft.`$base` VALUES (100L, 'new', 1.0)")
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$base`")
      .head().getLong(0) === 11L)
    assert(CowTable.manifest(spark, base).map(_.file).toSet
      .intersect(before) === before, "append must not rewrite any file")
    // Spark itself refuses the overwrite at planning: the table declares
    // no truncate/dynamic-overwrite capability (which of the two the
    // message names depends on the session's partitionOverwriteMode),
    // so the guard never even needs the InsertableRelation's own require
    val e = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE graft.`$base` VALUES (1L, 'x', 0.0)")
    }
    assert(e.getMessage.contains("does not support") ||
      e.getMessage.contains("INSERT OVERWRITE is not supported"))
    assert(CowTable.read(spark, base).count() === 11L, "nothing overwritten")
  }

  test("DELETE FROM without WHERE truncates; schema survives") {
    val base = Files.createTempDirectory("gcat_trunc").toString + "/t"
    CowTable.create(spark, base, table(10), "id", numFiles = 2)
    spark.sql(s"DELETE FROM graft.`$base`")
    val got = spark.sql(s"SELECT * FROM graft.`$base`")
    assert(got.columns.toSeq === Seq("id", "nm", "amt"))
    assert(got.count() === 0L)
    spark.sql(s"INSERT INTO graft.`$base` VALUES (1L, 'back', 2.0)")
    assert(spark.sql(s"SELECT nm FROM graft.`$base`")
      .head().getString(0) === "back")
  }

  test("SELECT through the catalog serves a deletion-vectored manifest") {
    val base = Files.createTempDirectory("gcat_dv").toString + "/t"
    CowTable.create(spark, base, table(100), "id", numFiles = 2)
    CowTable.dvDelete(spark, base, col("id") % 10 === 0)
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$base`")
      .head().getLong(0) === 90L)
    assert(spark.sql(s"SELECT SUM(amt) FROM graft.`$base` WHERE id <= 10")
      .head().getDouble(0) === (1 to 9).map(_ * 10.0).sum)
  }

  test("a non-cow path is NoSuchTable, not a crash") {
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM graft.`/nonexistent/nowhere`").collect()
    }
  }
}
