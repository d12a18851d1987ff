package graft.io

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

/** Driver-visible checks for the WRITE path (M1/M3 window reloads, S5
  * truncate-before-load, S7/S8 export→stage→load): each registered query
  * physically writes through the reload/migrate machinery into a temp
  * target, re-reads the files, and returns a frame the driver compares
  * against the ordinary read-side oracle. This is the difference between
  * "the writers are spec-tested" and "the writers are proven against the
  * oracle": a bug in partition overwrite, straddler carry, or the staging
  * hop shows up as a hash mismatch on these entries.
  *
  * Each body runs the reload TWICE with the same window — the reference's
  * signature semantic (`sql/init/01_init_all.sql:72-73` delete+insert) is
  * idempotent on the final state, so the second run must change nothing.
  */
object ReloadChecks {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  /** M1: silver → partitioned window reload → re-read. Oracle = the plain
    * silver oracle (the reload must be lossless and idempotent).
    */
  def silverReloaded(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "silver_reloaded", dir, "silver_reloaded") {
      val silver = Pipeline.silverCached(spark, dir)
      val target = tmpDir("graft_silver_reload") + "/silver"
      WindowReload.reload(spark, target, silver,
        Pipeline.defaultStart, Pipeline.defaultEnd)
      WindowReload.reload(spark, target, silver,
        Pipeline.defaultStart, Pipeline.defaultEnd)
      // partitionBy moved effective_from to the end; restore silver's order
      WindowReload.read(spark, target)
        .select(silver.columns.map(col).toIndexedSeq: _*)
    }

  /** M3: DQ results → run_date-partitioned purge+append → re-read.
    * Oracle = the dq_checks oracle plus the constant run_date.
    */
  def dqReloaded(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "dq_reloaded", dir, "dq_reloaded") {
      val results = graft.dq.DqSuite.run(spark,
        Pipeline.silverCached(spark, dir), Pipeline.fact(spark, dir))
      val target = tmpDir("graft_dq_reload") + "/dq_results"
      val runDate = java.time.LocalDate.parse("2024-01-15")
      WindowReload.reloadResults(spark, target, results, runDate)
      WindowReload.reloadResults(spark, target, results, runDate)
      spark.read.parquet(target)
        .select((results.columns :+ "run_date").map(col).toIndexedSeq: _*)
    }

  /** Atomic star publish under a FIXED audit clock (F13 + SURVEY §7.5):
    * the full runner pipeline writes dims + fact as one
    * [[AtomicPublish]] version into a temp warehouse — twice, proving
    * the publish (and the grow-only dim upsert through the manifest) is
    * idempotent — and the fact is read back THROUGH the committed
    * manifest. With `spark.graft.run_ts` pinned, `created_dt` is a
    * constant the oracle states literally, closing the last
    * non-oracle-able audit column; the crash-window all-or-nothing
    * property is AtomicPublishSpec's half.
    */
  def starPublish(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "star_publish", dir, "star_publish") {
      val wh = tmpDir("graft_star_publish")
      spark.conf.set("spark.graft.run_ts", "2024-01-15 12:00:00")
      try {
        graft.PipelineRunner.run(spark, dir, wh,
          Pipeline.defaultStart, Pipeline.defaultEnd)
        graft.PipelineRunner.run(spark, dir, wh,
          Pipeline.defaultStart, Pipeline.defaultEnd)
      } finally spark.conf.unset("spark.graft.run_ts")
      AtomicPublish.read(spark, s"$wh/star", "fact")
    }

  /** S7/S8: fact → staging parquet (S5 overwrite) → window reload into the
    * target mart → row-count reconciliation (`migrate_to_mysql.py:84-88`).
    * Oracle = fact counts (the staged and loaded sides must both equal the
    * windowed fact, and agree).
    */
  def exportReconcile(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "export_reconcile", dir, "export_reconcile") {
      import spark.implicits._
      val fact = Pipeline.fact(spark, dir)
      val base = tmpDir("graft_export")
      val rec = Export.migrate(spark, fact, s"$base/staging", s"$base/mart",
        Pipeline.defaultStart, Pipeline.defaultEnd)
      Seq((rec.staged, rec.loaded, rec.ok))
        .toDF("staged_rows", "loaded_rows", "reconciled")
    }

  /** Compliance delete (right-to-be-forgotten): purge a deterministic
    * set of users (`user_id % mod == rem` — standing in for the DSR
    * queue) from the events table by REWRITE — the only way to delete
    * from immutable columnar files, and what Delta/Iceberg DELETE
    * compiles to under the hood. The per-user audit row a DSR process
    * must retain is computed FROM THE RELOADED FILES: `n_deleted` =
    * count before − count remaining in the rewritten table, `purged` =
    * zero rows remain. A writer bug that leaks or over-deletes rows
    * diverges these numbers from the read-side oracle (which states
    * what SHOULD have been deleted) — the same written-state proof
    * shape as `corpus_export`/`silver_reloaded`. The driver-checked
    * `require` additionally pins total row conservation: exactly the
    * audited rows disappeared, nothing else.
    *
    * At 100 TB the rewrite is partition-pruned (only partitions holding
    * DSR users rewrite — here the table is unpartitioned so the rewrite
    * is full, as the smallest honest demonstration); the audit is two
    * map-side-combined per-user counts.
    */
  def purgeUsers(spark: SparkSession, dir: String,
                 mod: Int = 97, rem: Int = 13): DataFrame =
    graft.Memo(spark, "purge_users", dir, "purge_users") {
      val ev = graft.Tables.events(spark, dir)
      val hit = col("user_id") % mod === rem
      val target = tmpDir("graft_purge") + "/events"
      ev.filter(!hit)
        .write.mode("overwrite").parquet(target)
      val reloaded = spark.read.parquet(target)

      val before = ev.filter(hit).groupBy("user_id")
        .agg(count(lit(1)).as("n_before"))
      val after = reloaded.filter(hit).groupBy("user_id")
        .agg(count(lit(1)).as("n_remaining"))
      val audit = before.join(after, Seq("user_id"), "left")
        .select(col("user_id"),
          (col("n_before") - coalesce(col("n_remaining"), lit(0L))).as("n_deleted"),
          (coalesce(col("n_remaining"), lit(0L)) === 0L).as("purged"))

      // row conservation, from the reloaded files: only the audited
      // rows disappeared
      val deleted = audit.agg(sum("n_deleted")).head().getLong(0)
      require(reloaded.count() == ev.count() - deleted,
        "purge rewrite lost or duplicated unrelated rows")
      audit
    }

  val purgeUsersSql: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_deleted, TRUE AS purged
      |FROM events WHERE user_id % 97 = 13 GROUP BY 1""".stripMargin
}
