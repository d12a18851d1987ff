package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{AtomicPublish, FsUtil}

/** Publish/subscribe on the table's own commit log: every
  * [[AtomicPublish]] version becomes one exactly-once micro-batch of
  * the `graft-artifact` streaming source (no side-channel queue, no
  * file-listing heuristics — the offset IS the transaction id). This is
  * how downstream consumers at 100 TB should ingest the engine's
  * published tables: each batch is exactly the rows one atomic commit
  * added, ordered, replayable from a checkpoint, and immune to partial
  * writes because unsealed versions are invisible to [[AtomicPublish]]
  * readers by construction.
  */
object PublishFeed {

  /** The registered check: slice the daily events rollup into ≤8
    * key-disjoint publishes; half land BEFORE the stream starts (catch-up
    * batches), half land while it runs (live batches, proven consumed
    * in-band). The union of all batches must equal the full rollup —
    * any dropped or double-delivered version breaks the oracle hash. */
  def check(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_publish_feed", dir, "pub_feed") {
      val base = FsUtil.stateDir("pub_feed", dir)
      val fs = new Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true) // self-contained
      val daily = graft.Tables.events(spark, dir)
        .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // sliced 8 ways below: compute the rollup once
      val days = daily.select("event_date").distinct()
        .orderBy("event_date").collect().map(_.getDate(0)) // day-count bounded
      val slices = days.grouped(math.max(1, math.ceil(days.length / 8.0).toInt))
        .toSeq.map(_.toSeq)
      val retain = slices.size + 1
      def publishSlice(s: Seq[java.sql.Date]): Unit = {
        AtomicPublish.publish(spark, base,
          Seq("daily" -> daily.filter(col("event_date").isin(s: _*))), retain)
        ()
      }
      val (head, tail) = slices.splitAt(math.max(1, slices.size / 2))
      head.foreach(publishSlice)

      val tbl = "pub_feed_" +
        java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)
      val q = spark.readStream.format("graft-artifact")
        .option("base", base).option("dataset", "daily")
        .load()
        .writeStream.format("memory").queryName(tbl)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val caughtUp = spark.table(tbl).count()
        tail.foreach(publishSlice) // live commits while the stream runs
        q.processAllAvailable()
        if (tail.nonEmpty)
          require(spark.table(tbl).count() > caughtUp,
            "live-published versions must reach the running stream")
      } finally q.stop()
      spark.table(tbl).orderBy("event_date", "event_type")
    }

  val checkSql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
      |       CAST(COUNT(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
