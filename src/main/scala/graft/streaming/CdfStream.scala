package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{AtomicPublish, CowTable, FsUtil}

/** Streaming CHANGE DATA FEED consumption — the subscription form of
  * [[CowTable.changesSince]]: `readStream.format("graft-artifact")` with
  * `cow=true, changeFeed=true` turns every committed version into one
  * exactly-once micro-batch of row-level I/U/D changes, so a downstream
  * consumer (replica, search index, feature cache) follows the table
  * with no polling cursor of its own — the checkpoint IS the cursor,
  * and a restart resumes exactly after the last version it applied.
  */
object CdfStream {

  /** The registered check: the cdf-replay history (COW merge → DV
    * delete → COW delete, every version retained) consumed THROUGH the
    * streaming source, folded version by version onto the v0 snapshot.
    * The fold must reproduce the final table bit-for-bit (in-band
    * require against the direct read — same contract as
    * [[CowTable.cdfReplayCheck]]'s batch cursor, now proven for the
    * stream path); the oracle replays the history relationally. */
  def check(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "stream_cdf", dir, "cow_scdf") {
      val base = FsUtil.stateDir("cow_scdf", dir)
      val fs = new Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true) // self-contained
      val v0 = CowTable.create(spark, base, graft.Tables.orders(spark, dir),
        "o_orderkey", numFiles = 8, retain = 8)
      CowTable.merge(spark, base, CowTable.rangeLocalBatch(spark, dir),
        "o_orderkey", retain = 8) // v1: COW merge
      CowTable.dvDelete(spark, base, col("o_orderkey") % 19 === 7,
        retain = 8) // v2: merge-on-read delete
      CowTable.deleteWhere(spark, base, col("o_orderstatus") === "I",
        "o_orderkey", retain = 8) // v3: COW delete (drops the inserts)

      val tbl = "cdf_feed_" +
        java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)
      val ck = java.nio.file.Files.createTempDirectory("graft_cdf_ck").toFile
      ck.deleteOnExit()
      val q = spark.readStream.format("graft-artifact")
        .option("base", base).option("cow", "true")
        .option("changeFeed", "true").option("key", "o_orderkey")
        .option("startVersion", (v0 + 1).toString)
        .load()
        .writeStream.format("memory").queryName(tbl)
        .option("checkpointLocation", ck.getAbsolutePath)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()

      val feed = spark.table(tbl).localCheckpoint()
      var snap = CowTable.readAt(spark, base, v0)
      AtomicPublish.versions(spark, base).filter(_ > v0).foreach { v =>
        val ch = feed.filter(col("_commit_version") === v)
        val ups = ch.filter(col("_change_type") =!= "delete")
          .drop("_change_type", "_commit_version")
        snap = snap
          .join(ch.select(col("o_orderkey")).distinct(),
            Seq("o_orderkey"), "left_anti")
          .unionByName(ups)
      }
      val folded = CowTable.statusAgg(snap).collect().toSeq
      val direct = CowTable.statusAgg(CowTable.read(spark, base))
      require(direct.collect().toSeq == folded,
        "the streamed change feed must reproduce the final snapshot")
      direct
    }

  /** Same relational replay as the batch CDC cursor — the stream carries
    * the identical change set, just delivered as micro-batches. */
  val checkSql: String = CowTable.cdfReplaySql
}
