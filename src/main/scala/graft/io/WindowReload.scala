package graft.io

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M1 — the reference's signature write semantic: idempotent
  * delete-then-insert for a date window
  * (`/root/reference/sql/init/01_init_all.sql:72-73`:
  * `DELETE FROM target WHERE effective_from >= start AND effective_to <= end`
  * then `INSERT ... SELECT ... WHERE` the same window). Re-running for the
  * same window is a no-op on the final state.
  *
  * Parquet has no row deletes, so the reload is expressed as a
  * partition-level rewrite designed for 100 TB:
  *
  *  - the target is partitioned by `effective_from` → the delete predicate's
  *    `effective_from >= start` prunes to the `[start, end]` partition range
  *    (the analog of the reference's `idx_structured_dates` index);
  *  - rows in those partitions that the delete predicate does NOT match
  *    ("straddlers": `effective_from >= start` but `effective_to > end`)
  *    are read back (partition-pruned scan) and re-written alongside the
  *    new data — note the reference's quirk is preserved: a row straddling
  *    the window is never reloaded, only carried;
  *  - `partitionOverwriteMode=dynamic` then replaces ONLY the partitions
  *    the union touches; partitions outside `[start, end]` are never read
  *    or written.
  *
  * Incoming rows with `effective_from` outside `[start, end]` cannot match
  * the insert window (`from >= start AND to <= end` forces
  * `start <= from <= to <= end`), so every written partition is inside the
  * pruned range by construction.
  */
object WindowReload {

  def reload(spark: SparkSession,
             targetPath: String,
             incoming: DataFrame,
             start: LocalDate,
             end: LocalDate): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val s = lit(java.sql.Date.valueOf(start))
    val e = lit(java.sql.Date.valueOf(end))

    val windowed = incoming
      .filter(col("effective_from") >= s && col("effective_to") <= e)

    val existed = exists(spark, targetPath)
    // Eager localCheckpoint: (a) materializes the straddler scan BEFORE the
    // overwrite touches the same path — Spark otherwise rejects a plan that
    // reads and overwrites one location ("Cannot overwrite a path that is
    // also being read from"); (b) lets the stale-partition purge below
    // reuse the result instead of re-reading the replaced target.
    val toWrite = (
      if (existed) {
        val straddlers = spark.read.parquet(targetPath)
          .filter(col("effective_from") >= s && col("effective_from") <= e)
          .filter(col("effective_to") > e)
          .select(windowed.columns.map(col).toIndexedSeq: _*)
        straddlers.union(windowed)
      } else windowed
    ).localCheckpoint(true)

    // REBALANCE on the partition column before partitionBy: without it each
    // of the N upstream tasks writes a file into every date dir it touches
    // (N × days tiny files — at 1000 executors a small-file explosion and
    // a file-listing bottleneck on every subsequent scan). The AQE rebalance
    // shuffle yields ~one right-sized file per date and splits skewed dates
    // into multiple files instead of one giant task.
    toWrite.hint("rebalance", col("effective_from")).write
      .mode("overwrite")
      .partitionBy("effective_from")
      .parquet(targetPath)

    // Dynamic overwrite replaces only partitions the union touches; a
    // partition inside [start, end] whose rows ALL matched the delete
    // predicate and got no replacement rows would silently survive. The
    // reference's DELETE purges it — so drop such stale partition dirs.
    // The dir listing is bounded by the window's day count, not data size.
    if (existed) {
      val written = toWrite.select("effective_from").distinct()
        .collect().map(_.getDate(0).toLocalDate).toSet
      val p = new Path(targetPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("effective_from=")) {
          // skip unparseable partition names (e.g. a NULL-date partition
          // __HIVE_DEFAULT_PARTITION__ from a foreign bootstrap) — they
          // can't be inside the [start, end] window
          scala.util.Try(LocalDate.parse(name.stripPrefix("effective_from=")))
            .foreach { d =>
              if (!d.isBefore(start) && !d.isAfter(end) && !written.contains(d))
                fs.delete(st.getPath, true)
            }
        }
      }
    }
    toWrite.unpersist()
  }

  /** M3 twin — DQ-results window purge + append
    * (`fn_dq_checks_load.sql:15-17`): delete results whose run date falls
    * in the window, insert this run's rows. Partitioned by `run_date`, so
    * the purge is a pure partition overwrite (no straddlers: the predicate
    * is on the partition column itself).
    */
  def reloadResults(spark: SparkSession,
                    targetPath: String,
                    results: DataFrame,
                    runDate: LocalDate): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    results
      .withColumn("run_date", lit(java.sql.Date.valueOf(runDate)))
      .write.mode("overwrite").partitionBy("run_date").parquet(targetPath)
  }

  private def exists(spark: SparkSession, path: String): Boolean =
    FsUtil.exists(spark, path)
}
