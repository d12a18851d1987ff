package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The commit protocol shared by every foreachBatch state sink in this
  * library (events upsert, profile fold, doc dedup): state version
  * `v<batchId>` is written first, then `_committed` (the last applied
  * batchId) is swapped in via temp-file rename. A replayed batchId ≤
  * committed is skipped; a crash between the two writes leaves
  * `_committed` at the old version, so the replay simply rewrites
  * `v<batchId>` (overwrite) and re-attempts the swap — either way each
  * batch folds in exactly once under foreachBatch's at-least-once
  * contract. This is the standard idempotent-MERGE sink every lakehouse
  * foreachBatch example implements against a transactional table; here
  * the transaction is the rename.
  */
object VersionedState {

  /** Last committed batch id under `base`, −1 if none. */
  def committed(spark: SparkSession, base: org.apache.hadoop.fs.Path): Long = {
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = new org.apache.hadoop.fs.Path(base, "_committed")
    if (!fs.exists(f)) -1L
    else {
      val in = fs.open(f)
      try in.readLong() finally in.close()
    }
  }

  /** Fold `batchId` into the state under `base`: skip if already
    * committed; otherwise write `fold(previousState)` as `v<batchId>`
    * and swap the marker. `fold` receives `None` on the first batch.
    */
  def fold(spark: SparkSession, base: org.apache.hadoop.fs.Path, batchId: Long)
          (foldFn: Option[DataFrame] => DataFrame): Unit = {
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val last = committed(spark, base)
    if (batchId <= last) return // replayed batch: already folded in
    val prev =
      if (last < 0) None
      else Some(spark.read.parquet(
        new org.apache.hadoop.fs.Path(base, s"v$last").toString))
    foldFn(prev).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(base, s"v$batchId").toString)
    val committedF = new org.apache.hadoop.fs.Path(base, "_committed")
    val tmp = new org.apache.hadoop.fs.Path(base, "_committed.tmp")
    val outS = fs.create(tmp, true)
    try outS.writeLong(batchId) finally outS.close()
    if (fs.exists(committedF)) fs.delete(committedF, false)
    fs.rename(tmp, committedF)
  }
}
