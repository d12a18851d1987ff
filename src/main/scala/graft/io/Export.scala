package graft.io

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7/S8 — the reference's cross-engine migration
  * (`/root/reference/data-pipeline/src/migrate_to_mysql.py:32-88`):
  * extract the fact for a date window, load it into a staging dataset,
  * invoke the target-side transform (`fn_dm_data_stg_to_dm_load` — an M1
  * window reload into the target mart), then reconcile row counts.
  *
  * The reference funnels every row through driver memory (`fetchall` →
  * `executemany`); here both sides are executor-parallel parquet (a JDBC
  * target would swap the format string and add `batchsize`, nothing
  * else). The staging hop is kept deliberately — it is the reference's
  * audit/replay point, not an accident.
  */
object Export {

  case class Reconciliation(staged: Long, loaded: Long, ok: Boolean)

  /** Extract → stage → window-reload into the target → reconcile. */
  def migrate(spark: SparkSession,
              fact: DataFrame,
              stagingPath: String,
              targetPath: String,
              start: LocalDate,
              end: LocalDate): Reconciliation = {
    // extract the window (P2 both-bounds predicate) into staging (S5
    // truncate-before-load ≙ overwrite)
    fact
      .filter(col("effective_from") >= lit(java.sql.Date.valueOf(start)) &&
        col("effective_to") <= lit(java.sql.Date.valueOf(end)))
      .write.mode("overwrite").parquet(stagingPath)

    // target-side stored-procedure analog: M1 reload from staging
    val staged = spark.read.parquet(stagingPath)
    WindowReload.reload(spark, targetPath, staged, start, end)

    // row-count reconciliation (migrate_to_mysql.py:84-88)
    val stagedN = staged.count()
    val loadedN = WindowReload.read(spark, targetPath)
      .filter(col("effective_from") >= lit(java.sql.Date.valueOf(start)) &&
        col("effective_to") <= lit(java.sql.Date.valueOf(end)))
      .count()
    Reconciliation(stagedN, loadedN, stagedN == loadedN)
  }
}
