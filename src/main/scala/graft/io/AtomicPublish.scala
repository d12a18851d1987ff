package graft.io

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic MULTI-dataset publish — the [[graft.streaming.VersionedState]]
  * marker protocol extended from one state table to a SET of datasets
  * exposed as one unit: all members of version `v<N>` are written first
  * (each its own parquet dir), a `_PUBLISHED` marker naming the members
  * seals the version, and only then is the `_committed` pointer swapped
  * via an ATOMIC rename-with-overwrite. Readers always resolve through
  * the pointer, so a crash ANYWHERE between the first dataset write and
  * the swap leaves them on the previous complete version — no reader
  * can ever observe new dims with the old fact.
  *
  * This closes the reference's one transactional-semantics gap: the
  * star build writes 4 dims + fact inside a single PostgreSQL
  * transaction (`/root/reference/data-pipeline/src/fill_dm_table.py:18-23`),
  * while a naive parquet port writes five directories sequentially with
  * a crash window between each (SURVEY §7.5). One pointer swap restores
  * the all-or-nothing contract — the same mechanism lakehouse table
  * formats use (a version = a manifest, commit = pointer swap), applied
  * across datasets.
  *
  * Recovery: if the pointer file is ever lost, [[committed]] falls back
  * to the largest version carrying a `_PUBLISHED` marker (a partial
  * crash write has no marker and is invisible). Superseded versions are
  * pruned after each successful swap, so storage stays O(1) versions.
  */
object AtomicPublish {

  private val VDir = "^v(\\d+)$".r

  private def fsOf(spark: SparkSession, base: Path) =
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def publishedVersions(spark: SparkSession, base: Path): Seq[Long] = {
    val fs = fsOf(spark, base)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case VDir(n) if fs.exists(new Path(st.getPath, "_PUBLISHED")) =>
            Some(n.toLong)
          case _ => None
        }
    }.flatten
  }

  /** Last committed version under `base`, −1 if none. */
  def committed(spark: SparkSession, base: String): Long = {
    val b = new Path(base)
    val fs = fsOf(spark, b)
    val f = new Path(b, "_committed")
    if (fs.exists(f)) {
      val in = fs.open(f)
      try in.readLong() finally in.close()
    } else {
      val vs = publishedVersions(spark, b)
      if (vs.isEmpty) -1L else vs.max
    }
  }

  /** True once any version has been committed. */
  def exists(spark: SparkSession, base: String): Boolean =
    committed(spark, base) >= 0

  /** Read dataset `name` of the committed version. */
  def read(spark: SparkSession, base: String, name: String): DataFrame = {
    val v = committed(spark, base)
    require(v >= 0, s"no committed version under $base")
    spark.read.parquet(s"$base/v$v/$name")
  }

  /** Time-travel read: dataset `name` AS OF `version`. Only versions a
    * `retain` window kept are readable; a pruned or never-sealed
    * version fails fast rather than returning a partial directory.
    */
  def readVersion(spark: SparkSession, base: String, name: String,
                  version: Long): DataFrame = {
    val b = new Path(base)
    require(fsOf(spark, b).exists(new Path(b, s"v$version/_PUBLISHED")),
      s"version $version under $base is not published (pruned or partial)")
    spark.read.parquet(s"$base/v$version/$name")
  }

  /** All readable (sealed, unpruned) version ids under `base`, ascending. */
  def versions(spark: SparkSession, base: String): Seq[Long] =
    publishedVersions(spark, new Path(base)).sorted

  /** Write all `datasets` as the next version and commit them with one
    * pointer swap; returns the committed version id. Each frame is
    * fully materialized into `v<next>` BEFORE the marker and swap, so
    * the commit point is a single metadata operation.
    */
  def publish(spark: SparkSession, base: String,
              datasets: Seq[(String, DataFrame)]): Long =
    publish(spark, base, datasets, retain = 1)

  /** As [[publish]], keeping the newest `retain` committed versions on
    * disk (a lakehouse-style retention window): readers still resolve
    * the pointer, but [[readVersion]] can time-travel to any retained
    * version. `retain = 1` is the storage-O(1) default.
    */
  def publish(spark: SparkSession, base: String,
              datasets: Seq[(String, DataFrame)], retain: Int): Long = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val b = new Path(base)
    val fs = fsOf(spark, b)
    val next = committed(spark, base) + 1
    datasets.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$base/v$next/$name")
    }
    // seal: the version is complete (all members present) but not live
    val marker = fs.create(new Path(b, s"v$next/_PUBLISHED"), true)
    try marker.write(datasets.map(_._1).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally marker.close()
    // commit: atomic pointer swap (no window with the pointer absent)
    val tmp = new Path(b, "_committed.tmp")
    val out = fs.create(tmp, true)
    try out.writeLong(next) finally out.close()
    val fc = FileContext.getFileContext(b.toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new Path(b, "_committed"), Options.Rename.OVERWRITE)
    // prune versions older than the retention window (readers only ever
    // resolve the pointer; retained history serves time-travel reads)
    publishedVersions(spark, b).filter(_ <= next - retain)
      .foreach(n => fs.delete(new Path(b, s"v$n"), true))
    next
  }
}
