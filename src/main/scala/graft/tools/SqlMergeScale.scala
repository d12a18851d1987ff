package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.CowTable

/** Builder-side scale experiment for the GROUP-BASED SQL `MERGE INTO`
  * (SCALE.md's 100× protocol): replicate orders N× (FK-consistent key
  * offsets), build a cow table, then run a RANGE-LOCAL MERGE whose
  * matched keys live in ONE of the table's files. What is measured:
  *
  *   - `merge_s`: the statement's wall — with runtime group filtering
  *     this is one key-column discovery scan + the matched file's
  *     rewrite, NOT a table read (r12's delta-based MERGE read every
  *     data page of every column);
  *   - `full_scan_s`: a full-table aggregate over the same snapshot —
  *     the lower bound the OLD path's target read paid before writing;
  *   - `untouched`: manifest entries carried byte-identical (must be
  *     files−1: only the matched file rewrites; inserts append).
  *
  * Usage: runMain graft.tools.SqlMergeScale <sfDir> [copies] [files]
  */
object SqlMergeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val copies = if (args.length > 1) args(1).toInt else 100
    val files = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders0 = graft.Tables.orders(spark, src)
    val mx0 = orders0.agg(max("o_orderkey")).head().getLong(0) + 1
    val orders = (0 until copies).map(c =>
      orders0.withColumn("o_orderkey", col("o_orderkey") + lit(c * mx0)))
      .reduce(_ unionAll _)

    val base = s"/tmp/graft_sqlmerge_scale_$copies/t"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val t0 = System.nanoTime()
    CowTable.create(spark, base, orders, "o_orderkey", numFiles = files)
    val createS = (System.nanoTime() - t0) / 1e9
    val nRows = CowTable.manifest(spark, base).map(_.rows).sum

    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    // matched keys: the lowest eighth of copy 0 = 1/(8·copies) of the
    // keyspace — ONE file's range at any copies ≥ files/8
    val k = col("o_orderkey")
    val srcDf = orders0.filter(k * 8 <= lit(mx0) && k % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(5.0))
      .unionByName(orders0.filter(k % 103 === 5)
        .withColumn("o_orderkey", k + lit(copies.toLong * mx0)))
    srcDf.createOrReplaceTempView("mrg_src")
    val pre = CowTable.manifest(spark, base).map(_.file).toSet

    val t1 = System.nanoTime()
    spark.sql(
      s"""MERGE INTO graft.`$base` t USING mrg_src s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
         |WHEN NOT MATCHED THEN INSERT
         |  (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |   o_orderdate, o_orderpriority)
         |  VALUES (s.o_orderkey, s.o_custkey, 'I', s.o_totalprice,
         |          s.o_orderdate, s.o_orderpriority)""".stripMargin)
    val mergeS = (System.nanoTime() - t1) / 1e9
    val untouched = CowTable.manifest(spark, base).map(_.file).toSet
      .intersect(pre).size

    val t2 = System.nanoTime()
    val total = spark.sql(
      s"SELECT SUM(o_totalprice) FROM graft.`$base`").head().getDouble(0)
    val fullScanS = (System.nanoTime() - t2) / 1e9

    println(f"""{"copies":$copies,"rows":$nRows,"files":$files,""" +
      f""""create_s":$createS%.1f,"merge_s":$mergeS%.1f,""" +
      f""""full_scan_s":$fullScanS%.1f,"untouched":$untouched,""" +
      f""""sum":$total%.2f}""")
    spark.stop()
  }
}
