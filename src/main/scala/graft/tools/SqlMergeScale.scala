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
  * Usage: runMain graft.tools.SqlMergeScale <sfDir> [copies] [files] [mode]
  *
  * `mode` (default `long`) re-runs the identical protocol over the two
  * other key paths the engine serves:
  *   - `string`: a VARCHAR clustering key with an adversarial shared
  *     prefix (`Customer#000…` — zero-padded, every key shares 9+
  *     chars), exercising the LCP-stripped 7-byte bucket encoding at
  *     scale;
  *   - `warehouse`: the long-key table addressed BY NAME through the
  *     catalog registry (`graft.<name>` + warehouse conf) — proves
  *     name resolution adds no scan cost;
  *   - `composite`: the tuple-keyed table (`(o_custkey, o_orderkey)` —
  *     the leading column alone non-unique) merged ON both key columns
  *     with matches confined to the lowest leading range — proves
  *     runtime pruning and the tuple row identity stay O(matched
  *     files) at 100×.
  */
object SqlMergeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val copies = if (args.length > 1) args(1).toInt else 100
    val files = if (args.length > 2) args(2).toInt else 64
    val mode = if (args.length > 3) args(3) else "long"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "string") { stringMode(spark, src, copies, files); return }
    if (mode == "composite") { compositeMode(spark, src, copies, files); return }

    val orders0 = graft.Tables.orders(spark, src)
    val mx0 = orders0.agg(max("o_orderkey")).head().getLong(0) + 1
    val orders = (0 until copies).map(c =>
      orders0.withColumn("o_orderkey", col("o_orderkey") + lit(c * mx0)))
      .reduce(_ unionAll _)

    val wh = s"/tmp/graft_sqlmerge_scale_$copies"
    val base = s"$wh/t"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val t0 = System.nanoTime()
    CowTable.create(spark, base, orders, "o_orderkey", numFiles = files)
    val createS = (System.nanoTime() - t0) / 1e9
    val nRows = CowTable.manifest(spark, base).map(_.rows).sum

    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    // warehouse mode: the SAME table addressed by NAME through the
    // registry — resolution goes conf → warehouse dir → cow meta
    val tref =
      if (mode == "warehouse") {
        spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
        "graft.t"
      } else s"graft.`$base`"
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
      s"""MERGE INTO $tref t USING mrg_src s
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
      s"SELECT SUM(o_totalprice) FROM $tref").head().getDouble(0)
    val fullScanS = (System.nanoTime() - t2) / 1e9

    println(f"""{"mode":"$mode%s","copies":$copies,"rows":$nRows,""" +
      f""""files":$files,"create_s":$createS%.1f,"merge_s":$mergeS%.1f,""" +
      f""""full_scan_s":$fullScanS%.1f,"untouched":$untouched,""" +
      f""""sum":$total%.2f}""")
    spark.stop()
  }

  /** The identical range-local protocol over the COMPOSITE clustering
    * key `(o_custkey, o_orderkey)`: replication multiplies the CUSTOMER
    * space (leading key), matches confine to copy 0's lowest eighth of
    * customers, and the MERGE joins on the full tuple. */
  private def compositeMode(spark: SparkSession, src: String, copies: Int,
                            files: Int): Unit = {
    val orders0 = graft.Tables.orders(spark, src)
      .select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice")
    val cmx0 = orders0.agg(max("o_custkey")).head().getLong(0) + 1
    val mx0 = orders0.agg(max("o_orderkey")).head().getLong(0) + 1
    val orders = (0 until copies).map(c =>
      orders0.withColumn("o_custkey", col("o_custkey") + lit(c * cmx0))
        .withColumn("o_orderkey", col("o_orderkey") + lit(c * mx0)))
      .reduce(_ unionAll _)

    val base = s"/tmp/graft_ckmerge_scale_$copies/t"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val t0 = System.nanoTime()
    CowTable.create(spark, base, orders, "o_custkey,o_orderkey",
      numFiles = files)
    val createS = (System.nanoTime() - t0) / 1e9
    val nRows = CowTable.manifest(spark, base).map(_.rows).sum

    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    val ck = col("o_custkey")
    val srcDf = orders0
      .filter(ck * 8 <= lit(cmx0) && col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(5.0))
      .unionByName(orders0.filter(col("o_orderkey") % 103 === 5)
        .withColumn("o_orderkey",
          col("o_orderkey") + lit(copies.toLong * mx0)))
    srcDf.createOrReplaceTempView("mrg_ck_src")
    val pre = CowTable.manifest(spark, base).map(_.file).toSet

    val t1 = System.nanoTime()
    spark.sql(
      s"""MERGE INTO graft.`$base` t USING mrg_ck_src s
         |ON t.o_custkey = s.o_custkey AND t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
         |WHEN NOT MATCHED THEN INSERT
         |  (o_custkey, o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (s.o_custkey, s.o_orderkey, 'I', s.o_totalprice)
         |""".stripMargin)
    val mergeS = (System.nanoTime() - t1) / 1e9
    val untouched = CowTable.manifest(spark, base).map(_.file).toSet
      .intersect(pre).size

    val t2 = System.nanoTime()
    val total = spark.sql(
      s"SELECT SUM(o_totalprice) FROM graft.`$base`").head().getDouble(0)
    val fullScanS = (System.nanoTime() - t2) / 1e9

    println(f"""{"mode":"composite","copies":$copies,"rows":$nRows,""" +
      f""""files":$files,"create_s":$createS%.1f,"merge_s":$mergeS%.1f,""" +
      f""""full_scan_s":$fullScanS%.1f,"untouched":$untouched,""" +
      f""""sum":$total%.2f}""")
    spark.stop()
  }

  /** The identical range-local protocol over a VARCHAR clustering key
    * whose every value shares a long zero-padded prefix — the
    * adversarial shape for the LCP-stripped order-preserving encoding
    * the string bucket join prunes on. */
  private def stringMode(spark: SparkSession, src: String, copies: Int,
                         files: Int): Unit = {
    val cust0 = graft.Tables.customer(spark, src)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val mx0 = cust0.agg(max("c_custkey")).head().getLong(0) + 1
    def nameOf(keyCol: org.apache.spark.sql.Column) =
      concat(lit("Customer#"), lpad(keyCol.cast("string"), 12, "0"))
    val cust = (0 until copies).map(c =>
      cust0.withColumn("c_custkey", col("c_custkey") + lit(c * mx0)))
      .reduce(_ unionAll _)
      .withColumn("c_name", nameOf(col("c_custkey")))

    val base = s"/tmp/graft_strmerge_scale_$copies/t"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val t0 = System.nanoTime()
    CowTable.create(spark, base, cust, "c_name", numFiles = files)
    val createS = (System.nanoTime() - t0) / 1e9
    val nRows = CowTable.manifest(spark, base).map(_.rows).sum

    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    // matched NAMES: the zero-padded encoding makes name order = key
    // order, so copy 0's lowest eighth is ONE file's range
    val k = col("c_custkey")
    val srcDf = cust0.filter(k * 8 <= lit(mx0) && k % 7 === 0)
      .withColumn("c_name", nameOf(k))
      .withColumn("c_acctbal", col("c_acctbal") + lit(5.0))
      .unionByName(cust0.filter(k % 103 === 5)
        .withColumn("c_name", nameOf(k + lit(copies.toLong * mx0)))
        .withColumn("c_custkey", k + lit(copies.toLong * mx0)))
    srcDf.createOrReplaceTempView("mrg_str_src")
    val pre = CowTable.manifest(spark, base).map(_.file).toSet

    val t1 = System.nanoTime()
    spark.sql(
      s"""MERGE INTO graft.`$base` t USING mrg_str_src s
         |ON t.c_name = s.c_name
         |WHEN MATCHED THEN UPDATE SET c_acctbal = s.c_acctbal
         |WHEN NOT MATCHED THEN INSERT
         |  (c_custkey, c_mktsegment, c_acctbal, c_name)
         |  VALUES (s.c_custkey, 'NEW', s.c_acctbal, s.c_name)""".stripMargin)
    val mergeS = (System.nanoTime() - t1) / 1e9
    val untouched = CowTable.manifest(spark, base).map(_.file).toSet
      .intersect(pre).size

    val t2 = System.nanoTime()
    val total = spark.sql(
      s"SELECT SUM(c_acctbal) FROM graft.`$base`").head().getDouble(0)
    val fullScanS = (System.nanoTime() - t2) / 1e9

    println(f"""{"mode":"string","copies":$copies,"rows":$nRows,""" +
      f""""files":$files,"create_s":$createS%.1f,"merge_s":$mergeS%.1f,""" +
      f""""full_scan_s":$fullScanS%.1f,"untouched":$untouched,""" +
      f""""sum":$total%.2f}""")
    spark.stop()
  }
}
