package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The commit protocol shared by every foreachBatch state sink in this
  * library (events upsert, profile fold, doc dedup): state version
  * `v<batchId>` is written first, then `_committed` (the last applied
  * batchId) is swapped in via an ATOMIC overwrite rename
  * (`FileContext.rename(..., Options.Rename.OVERWRITE)`), so there is no
  * window in which the marker is absent. A replayed batchId ≤ committed
  * is skipped; a crash before the swap leaves `_committed` at the old
  * version, so the replay simply rewrites `v<batchId>` (overwrite) and
  * re-attempts the swap — either way each batch folds in exactly once
  * under foreachBatch's at-least-once contract.
  *
  * Belt-and-suspenders: if the marker is ever missing but completed
  * `v<N>` versions exist (e.g. a legacy non-atomic swap crashed, or the
  * marker was deleted out-of-band), `committed()` recovers the largest N
  * whose directory carries Spark's `_SUCCESS` marker instead of
  * silently restarting from −1 — restarting would discard all folded
  * state, because the checkpointed file source does not replay earlier
  * batches. Superseded `v<M>` dirs (M < committed) are pruned after each
  * successful swap so state storage stays O(1) versions, not O(batches).
  */
object VersionedState {

  private val VDir = "^v(\\d+)$".r

  /** Completed version ids under `base` (dirs `v<N>` containing a
    * `_SUCCESS` marker — a crash mid-write leaves no `_SUCCESS`, so
    * partial writes are never treated as committed state).
    */
  private def completedVersions(fs: org.apache.hadoop.fs.FileSystem,
                                base: Path): Seq[Long] =
    if (!fs.exists(base)) Seq.empty
    else
      fs.listStatus(base).toSeq.collect {
        case st if st.isDirectory =>
          st.getPath.getName match {
            case VDir(n) if fs.exists(new Path(st.getPath, "_SUCCESS")) =>
              Some(n.toLong)
            case _ => None
          }
      }.flatten

  /** Last committed batch id under `base`, −1 if none. Falls back to the
    * largest completed `v<N>` when the marker file is missing.
    */
  def committed(spark: SparkSession, base: Path): Long = {
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = new Path(base, "_committed")
    if (fs.exists(f)) {
      val in = fs.open(f)
      try in.readLong() finally in.close()
    } else {
      val vs = completedVersions(fs, base)
      if (vs.isEmpty) -1L else vs.max
    }
  }

  /** Fold `batchId` into the state under `base`: skip if already
    * committed; otherwise write `fold(previousState)` as `v<batchId>`,
    * atomically swap the marker, and prune superseded versions. `fold`
    * receives `None` on the first batch.
    */
  def fold(spark: SparkSession, base: Path, batchId: Long)
          (foldFn: Option[DataFrame] => DataFrame): Unit = {
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val last = committed(spark, base)
    if (batchId <= last) return // replayed batch: already folded in
    val prev =
      if (last < 0) None
      else Some(spark.read.parquet(new Path(base, s"v$last").toString))
    foldFn(prev).write.mode("overwrite")
      .parquet(new Path(base, s"v$batchId").toString)
    val committedF = new Path(base, "_committed")
    val tmp = new Path(base, "_committed.tmp")
    val outS = fs.create(tmp, true)
    try outS.writeLong(batchId) finally outS.close()
    // Atomic swap: rename-with-overwrite has no delete/rename window, so
    // the marker is never absent on a filesystem with atomic rename.
    val fc = FileContext.getFileContext(base.toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, committedF, Options.Rename.OVERWRITE)
    // Prune superseded versions — the next fold only ever reads
    // v<committed>, so older dirs are dead weight.
    completedVersions(fs, base).filter(_ < batchId)
      .foreach(n => fs.delete(new Path(base, s"v$n"), true))
  }
}
