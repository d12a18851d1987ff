package graft.io

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted query-result cache keyed by PLAN FINGERPRINT — the
  * cross-session complement of the in-session [[graft.Memo]], and the
  * engine feature warehouses call "result reuse": if the same logical
  * query over the same data arrives again (tomorrow's dashboard
  * refresh, a re-run notebook), serve the stored result instead of
  * re-scanning the fact tables.
  *
  * The fingerprint hashes (a) the CANONICALIZED optimized logical plan
  * — alias names and expression ids normalized away, so any
  * syntactically different but plan-identical query hits the same entry
  * — and (b) a snapshot of every input file's (path, length, mtime).
  * Parquet overwrites produce new part-file names, so ANY rewrite of an
  * input — compaction, a window reload, a new ingest — changes the
  * snapshot and invalidates the entry structurally; a stale hit is
  * impossible as long as results are deterministic (every registered
  * query is). Entries commit by parquet write + `_SUCCESS`, so a crash
  * mid-write leaves a miss, never a partial hit.
  *
  * At 100 TB the economics are the point: the cache stores RESULT-sized
  * parquet (a rollup, a top-k, a profile — KBs to MBs) and the hit path
  * reads only that, while the miss path is the query the user was going
  * to run anyway. The plan-fingerprint check itself never touches data:
  * one optimizer pass plus a file-listing of the inputs.
  */
object ResultCache {

  /** SHA-256 over the canonicalized optimized plan + input snapshot.
    * Caveat: a frame whose lineage was cut (a [[graft.Memo]]
    * `LogicalRDD`, an in-memory relation) reports no input files, so
    * its fingerprint keys on the plan alone — serve only scan-backed
    * frames through the cache, as `result_cache_daily` does.
    */
  def fingerprint(df: DataFrame): String = {
    // render the canonicalized plan WITHOUT field truncation: toString
    // elides attribute/expression lists past spark.sql.debug
    // .maxToStringFields (default 25) as "... N more fields", so two
    // wide-table queries differing only beyond the cutoff would collide
    // and the cache would serve the wrong stored result
    val plan = df.queryExecution.optimizedPlan.canonicalized.treeString(
      verbose = true, addSuffix = false, maxFields = Int.MaxValue,
      printOperatorId = false, printOutputColumns = false)
    val md = MessageDigest.getInstance("SHA-256")
    md.update(plan.getBytes(StandardCharsets.UTF_8))
    md.update(0.toByte)
    md.update(inputSnapshot(df).getBytes(StandardCharsets.UTF_8))
    md.digest().map("%02x".format(_)).mkString
  }

  /** `path|length|mtime` lines for every input file of `df`, sorted —
    * the structural-invalidation half of the fingerprint, reused by the
    * persisted-artifact builders ([[graft.ops.AnnIndex]]) to detect
    * that the data under an unchanged path changed.
    */
  def inputSnapshot(df: DataFrame): String = {
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    df.inputFiles.sorted.map { f =>
      val p = new Path(f)
      val st = p.getFileSystem(hconf).getFileStatus(p)
      s"$f|${st.getLen}|${st.getModificationTime}"
    }.mkString("\n")
  }

  /** Serve `df` through the cache at `cacheDir`. Returns the served
    * frame and whether it was a hit. On a miss the result is written
    * (then read back, so hit and miss return plan-identical frames).
    *
    * Miss path commits via write-to-unique-temp + rename: concurrent
    * sessions missing the same fingerprint each write their own temp
    * dir and the first rename wins (the loser deletes its temp and
    * reads the winner) — two writers can never interleave inside one
    * entry directory.
    */
  def serve(spark: SparkSession, cacheDir: String)
           (df: DataFrame): (DataFrame, Boolean) = {
    val fp = fingerprint(df)
    val entry = new Path(s"$cacheDir/$fp")
    val fs = entry.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(entry, "_SUCCESS")))
      (spark.read.parquet(entry.toString), true)
    else {
      val tmp = new Path(s"$cacheDir/.tmp_${fp}_${java.util.UUID.randomUUID()}")
      df.write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, entry)) fs.delete(tmp, true) // lost the race
      (spark.read.parquet(entry.toString), false)
    }
  }
}
