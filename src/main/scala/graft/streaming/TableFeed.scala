package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{CowTable, FsUtil}

/** `spark.readStream.table("graft.t")` — subscribing to a NAMED cow
  * table through the catalog, no format string, no base-path option:
  * the first micro-batch is the earliest retained snapshot, every later
  * committed version arrives as its insert/update post-images (cost
  * O(changed files) per batch — the reference's consumers poll whole
  * tables; a 100 TB subscriber must not). The name-addressed twin of
  * `stream_publish_feed`.
  */
object TableFeed {

  /** The registered check: a warehouse-named cow table built from a
    * third of orders, subscribed by name; the other two thirds are
    * appended WHILE the stream runs (in-band: the live batches must
    * reach the subscriber — the streamed count grows after each
    * append), and the folded stream must equal the whole table. The
    * oracle is the plain orders rollup: any dropped or double-delivered
    * batch breaks the hash. */
  def check(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_table_read", dir, "tbl_feed") {
      val wh = FsUtil.stateDir("tbl_feed_wh", dir)
      val fs = new Path(wh)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(wh), true) // self-contained
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
      val orders = graft.Tables.orders(spark, dir)
      val k = col("o_orderkey")
      val base = s"$wh/feed_orders"
      // bootstrap third at v0; the stream must retain enough history
      // for the diff batches (retain covers the two live appends)
      CowTable.create(spark, base, orders.filter(k % 3 === 0),
        "o_orderkey", numFiles = 4, retain = 4)

      val tbl = "tbl_feed_" +
        java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)
      val ck = java.nio.file.Files.createTempDirectory("graft_feed_ck").toFile
      ck.deleteOnExit()
      val q = spark.readStream.table("graft.feed_orders")
        .writeStream.format("memory").queryName(tbl)
        .option("checkpointLocation", ck.getAbsolutePath)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val bootstrapped = spark.table(tbl).count()
        require(bootstrapped > 0, "the bootstrap snapshot must arrive")
        CowTable.append(spark, base, orders.filter(k % 3 === 1),
          numFiles = 2, retain = 4)
        q.processAllAvailable()
        val afterLive = spark.table(tbl).count()
        require(afterLive > bootstrapped,
          "a live append must reach the running subscriber")
        CowTable.append(spark, base, orders.filter(k % 3 === 2),
          numFiles = 2, retain = 4)
        q.processAllAvailable()
      } finally q.stop()

      CowTable.statusAgg(spark.table(tbl))
    }

  /** The folded feed IS the whole table. */
  val checkSql: String =
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |                 AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
}
