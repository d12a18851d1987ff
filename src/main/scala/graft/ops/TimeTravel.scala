package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.AtomicPublish

/** Lakehouse time-travel (AS OF) reads over [[AtomicPublish]] version
  * history. `publish(..., retain = K)` keeps the newest K sealed
  * versions on disk; `readVersion` resolves any retained version, so a
  * pipeline can diff what a table said THEN against what it says NOW —
  * the audit primitive behind reproducible training-data releases
  * ("which rows entered the corpus between snapshot 12 and 13?").
  *
  * The registered check publishes two versions of the daily events
  * rollup — v_prev excludes the newest day, v_curr is complete — with a
  * retention window of 2, then answers "what changed between versions"
  * ENTIRELY from the retained history: v_curr EXCEPT v_prev. Because
  * the fold is day-replacement, that difference is exactly the newest
  * day's counts, which the oracle recomputes from the raw events. Both
  * version reads are rollup-sized parquet scans — at 100 TB the diff
  * never touches the fact table.
  */
object TimeTravel {

  def check(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "mv_time_travel", dir, "tt_state") {
      val base = graft.io.FsUtil.stateDir("tt_state", dir)
      // self-contained: rebuild the two-version history from scratch
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      def rollup(df: DataFrame) = df
        .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val events = graft.Tables.events(spark, dir)
      val cutoff = events.agg(max(to_date(col("ts")))).head().getDate(0)
      val vPrev = AtomicPublish.publish(spark, base, Seq("daily" ->
        rollup(events.filter(col("ts") < lit(cutoff).cast("timestamp")))),
        retain = 2)
      val vCurr = AtomicPublish.publish(spark, base, Seq("daily" ->
        rollup(events)), retain = 2)
      // the diff is answered from version history alone
      AtomicPublish.readVersion(spark, base, "daily", vCurr)
        .exceptAll(AtomicPublish.readVersion(spark, base, "daily", vPrev))
        .orderBy("event_date", "event_type")
    }

  val checkSql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
      |       CAST(COUNT(*) AS BIGINT) AS n
      |FROM events
      |WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The result-cache lifecycle as a registered check: the daily rollup
    * served twice through [[graft.io.ResultCache]] — the second serve
    * MUST hit (enforced here; the spec additionally proves the hit path
    * scans only the cache entry and that a source rewrite invalidates).
    * Returned rows come from the cached parquet, so the oracle verifies
    * the stored result, not just the live computation.
    */
  def resultCacheCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "result_cache_daily", dir, "rc_state") {
      import graft.io.ResultCache
      val cacheDir = graft.io.FsUtil.stateDir("result_cache", dir)
      def q = graft.plans.MvRewrite.dailyCounts(spark, dir)
      ResultCache.serve(spark, cacheDir)(q)
      val (served, hit) = ResultCache.serve(spark, cacheDir)(q)
      require(hit, "second serve of an identical plan must hit the cache")
      served
    }

  val resultCacheSql: String = graft.plans.MvRewrite.checkSql
}
