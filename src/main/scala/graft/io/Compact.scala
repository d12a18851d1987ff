package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every long-lived
  * parquet dataset needs at scale: streaming micro-batches, per-executor
  * write fanout and fine-grained dynamic overwrites all accumulate files
  * far below the scan-efficient size, and file listing + task scheduling
  * + footer reads cost per FILE, not per byte — a 100 TB table in 50 MB
  * files spends more driver time listing than executors spend scanning.
  *
  * `compactDir` rewrites a directory into ~`targetBytes` files with an
  * AQE rebalance (no column → pure size-based repacking; skewed inputs
  * split, small ones coalesce) behind [[FsUtil.safeReplace]]'s crash-safe
  * swap. Content is invariant by contract — the registered query proves
  * it: fragment a copy of `documents` into many small files, compact,
  * and emit (rows, order-independent digest, did-file-count-drop), with
  * the oracle computing the same digest straight off the source table.
  */
object Compact {

  case class Stats(filesBefore: Long, filesAfter: Long)

  private def dataFiles(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(st => st.isFile &&
      st.getPath.getName.endsWith(".parquet"))
  }

  /** Compact `path` in place to ~`targetBytes` files; returns before /
    * after file counts. The advisory-size conf is set for the rebalance
    * and restored after.
    */
  def compactDir(spark: SparkSession, path: String,
                 targetBytes: Long = 128L * 1024 * 1024): Stats = {
    val before = dataFiles(spark, path)
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, targetBytes.toString)
    try FsUtil.safeReplace(spark,
      spark.read.parquet(path).hint("rebalance"), path)
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    Stats(before, dataFiles(spark, path))
  }

  private val digestExpr =
    "bit_xor(CAST(conv(substring(md5(concat_ws('|', CAST(doc_id AS STRING), source, CAST(n_chars AS STRING))), 1, 15), 16, 10) AS BIGINT))"

  /** Registered proof: fragment a copy of `documents` into 64 small
    * files, compact, and emit the invariants the oracle can check — row
    * count, order-independent digest, and that the file count dropped.
    */
  def roundtrip(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "compact_roundtrip", dir, "compact_roundtrip") {
      val base = java.nio.file.Files.createTempDirectory("graft_compact")
        .toFile.getAbsolutePath + "/documents"
      graft.Tables.documents(spark, dir)
        .repartition(64) // the small-file pathology under test
        .write.mode("overwrite").parquet(base)
      val stats = compactDir(spark, base)
      spark.read.parquet(base).agg(
        count(lit(1)).as("n_rows"),
        expr(digestExpr).as("row_digest"))
        .select(col("n_rows"), col("row_digest"),
          lit(stats.filesAfter < stats.filesBefore).as("compacted"))
    }

  val roundtripSql: String =
    """SELECT count(*) AS n_rows,
      |       bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || source || '|' || CAST(n_chars AS VARCHAR)), 1, 15)) AS BIGINT)) AS row_digest,
      |       TRUE AS compacted
      |FROM documents""".stripMargin
}
