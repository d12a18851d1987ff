package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Filesystem helpers shared by the writers. */
object FsUtil {

  /** Collision-free per-data-directory state location. The previous
    * scheme keyed on `dir.hashCode` (32 bits, and Java string hashes
    * collide trivially), so two different data directories could
    * silently share — and clobber — each other's committed state. The
    * key is now the sanitized absolute path (readable in /tmp listings)
    * plus an 8-hex-digit SHA-256 prefix of the raw path, so sanitizing
    * can't re-introduce a collision ("a/b" vs "a_b").
    */
  def stateDir(family: String, dir: String): String = {
    val abs = new java.io.File(dir).getAbsolutePath
    val san = abs.replaceAll("[^A-Za-z0-9._-]", "_").replaceAll("^_+", "")
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    s"/tmp/graft_$family/$san-$h"
  }

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
