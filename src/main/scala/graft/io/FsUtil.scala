package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Filesystem helpers shared by the writers. */
object FsUtil {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** Crash-safe replace for datasets whose content is NOT rebuildable
    * from source (grow-only dims carry id history): write to `<path>.tmp`,
    * swap the old dir to `<path>.bak`, promote tmp, drop the backup. A
    * crash at any step leaves either the old or the new complete dataset
    * recoverable on disk — a plain `mode("overwrite")` deletes the only
    * copy before the new files commit.
    */
  def safeReplace(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".tmp")
    val bak = new Path(path + ".bak")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(p)) fs.rename(p, bak)
    fs.rename(tmp, p)
    fs.delete(bak, true)
  }
}
