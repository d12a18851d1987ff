package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write ROW-LEVEL operations — MERGE (upsert+delete), predicate
  * DELETE, file compaction (OPTIMIZE) and VACUUM — over a manifest-based
  * versioned table. This is the lakehouse answer to the reference's
  * row-level UPDATE/DELETE statements (PostgreSQL rewrites pages inside
  * a transaction, e.g. the dimension upserts in
  * `/root/reference/data-pipeline/src/fill_dm_table.py`): on an
  * immutable object store there is no in-place page write, so the unit
  * of rewrite must be the FILE, and the version must be METADATA.
  *
  * Layout under `base/`:
  *   - `files/<token>-<i>.parquet` — immutable pooled data files, written
  *     once, never modified, shared across versions;
  *   - `v<N>/manifest` — an [[AtomicPublish]] version whose ONLY payload
  *     is the manifest: one row per data file with its row count and
  *     key min/max. Committing a version = committing a manifest.
  *
  * Consequences at 100 TB:
  *   - a MERGE touching 0.1% of keys rewrites only the files whose
  *     key range intersects the source keys (found by a broadcast range
  *     join of source keys against the file-count-bounded manifest —
  *     never a scan of the table) and REFERENCES every other file
  *     unchanged in the new manifest. Merge cost is O(affected files +
  *     source), not O(table).
  *   - serializability comes from [[AtomicPublish.tryPublish]]: a merge
  *     computed against parent version P commits only if it lands at
  *     P+1. A concurrent writer winning the slot forces a recompute
  *     against the new state, so no committed row change is ever
  *     silently dropped (the lost-update anomaly plain `publish` would
  *     allow). Orphaned pool files from the losing attempt are garbage,
  *     reclaimed by [[vacuum]].
  *   - compaction is the same COW discipline applied to layout health:
  *     bin-pack undersized neighbors (by manifest row counts alone)
  *     into full files, reference the rest — the small-files problem
  *     cured without a table rewrite.
  *   - [[vacuum]] deletes pool files referenced by NO retained version.
  *     Like every lakehouse vacuum it must not race an in-flight writer
  *     (files are staged into the pool before their manifest commits);
  *     run it from the maintenance role, or pass a `graceMs` larger
  *     than the longest write.
  *
  * Keys are numeric (cast to long) — the manifest prunes on a single
  * clustering key, the same contract as the z-order demo's first
  * dimension. Overlapping key ranges after many merges degrade pruning,
  * never correctness ([[compact]] restores tight ranges by re-sorting).
  */
object CowTable {

  case class Entry(file: String, rows: Long, kmin: Long, kmax: Long)

  private def fsOf(spark: SparkSession, base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def norm(s: String): String = new Path(s).toUri.getPath

  /** `input_file_name()` with the scheme stripped, matching the manifest's
    * stored form. */
  private def fileCol: Column =
    regexp_replace(input_file_name(), "^file:/+", "/")

  /** Write `df` as `numFiles` range-partitioned, key-sorted pool files;
    * returns their manifest entries (stats from one scan of the NEW
    * files only). */
  private def writePool(spark: SparkSession, base: String, df: DataFrame,
                        key: String, numFiles: Int): Seq[Entry] = {
    val fs = fsOf(spark, base)
    val token = java.util.UUID.randomUUID().toString
    val tmp = new Path(base, s".data-$token")
    df.repartitionByRange(math.max(1, numFiles), col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(tmp.toString)
    val pool = new Path(base, "files")
    fs.mkdirs(pool)
    val moved = fs.listStatus(tmp).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("."))
      .sortBy(_.getName).zipWithIndex.map { case (p, i) =>
        val dst = new Path(pool, s"$token-$i.parquet")
        require(fs.rename(p, dst), s"pool move failed: $p -> $dst")
        norm(dst.toString)
      }
    fs.delete(tmp, true)
    if (moved.isEmpty) Seq.empty
    else {
      val stats = spark.read.parquet(moved: _*)
        .groupBy(fileCol.as("file"))
        .agg(count(lit(1)).as("rows"),
          min(col(key).cast("long")).as("kmin"),
          max(col(key).cast("long")).as("kmax"))
        .collect() // file-count bounded
        .map(r => Entry(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // a range partition that received no rows produces no part file;
      // nothing to reconcile — `moved` and `stats` agree by construction
      stats.sortBy(_.kmin).toSeq
    }
  }

  private def manifestDf(spark: SparkSession, entries: Seq[Entry]): DataFrame = {
    import spark.implicits._
    entries.toDF()
  }

  private def entriesAt(spark: SparkSession, base: String,
                        version: Long): Seq[Entry] = {
    import spark.implicits._
    AtomicPublish.readVersion(spark, base, "manifest", version)
      .as[Entry].collect().toSeq // file-count bounded
  }

  /** Create the table from `df` as version 0. */
  def create(spark: SparkSession, base: String, df: DataFrame, key: String,
             numFiles: Int, retain: Int = 1): Long = {
    val entries = writePool(spark, base, df, key, numFiles)
    val v = AtomicPublish.publish(spark, base,
      Seq("manifest" -> manifestDf(spark, entries)), retain)
    v
  }

  /** Scan of the committed snapshot (manifest-resolved file list). */
  def read(spark: SparkSession, base: String): DataFrame = {
    val v = AtomicPublish.committed(spark, base)
    require(v >= 0, s"no committed version under $base")
    val entries = entriesAt(spark, base, v)
    if (entries.isEmpty) // preserve schema even for an emptied table
      spark.read.parquet(s"$base/v$v/manifest").limit(0)
    else spark.read.parquet(entries.map(_.file): _*)
  }

  /** Manifest of the committed snapshot. */
  def manifest(spark: SparkSession, base: String): Seq[Entry] =
    entriesAt(spark, base, AtomicPublish.committed(spark, base))

  /** MERGE: `source` carries full-width rows plus a boolean `_delete`
    * column (absent ⇒ all upserts). Matched keys are replaced by their
    * source row (or dropped when `_delete`), unmatched upserts are
    * inserted. Only files whose key range intersects a source key are
    * rewritten; commits retry against fresh state on conflict.
    *
    * `beforeCommit` is a test seam (fires once per attempt, before the
    * CAS) — production callers leave the default no-op.
    */
  def merge(spark: SparkSession, base: String, source: DataFrame,
            key: String, retain: Int = 1,
            beforeCommit: () => Unit = () => ()): Long = {
    val src = (if (source.columns.contains("_delete")) source
               else source.withColumn("_delete", lit(false)))
      .localCheckpoint() // evaluate once across retries and file scans
    var result = -1L
    while (result < 0) {
      val parent = AtomicPublish.committed(spark, base)
      require(parent >= 0, s"no committed version under $base")
      val entries = entriesAt(spark, base, parent)
      val mDf = manifestDf(spark, entries)
      require(entries.size <= graft.Bcast.SafeRows,
        s"manifest too large to broadcast (${entries.size} files); " +
          "an interval index over the manifest is the scale path")
      val srcKeys = src.select(col(key).cast("long").as("_gf_k")).distinct()
      val affected = srcKeys
        .join(graft.Bcast.ifBounded(mDf, graft.Bcast.SafeRows),
          col("_gf_k") >= col("kmin") && col("_gf_k") <= col("kmax"))
        .select("file").distinct().collect().map(_.getString(0)).toSet
      val untouched = entries.filterNot(e => affected.contains(e.file))
      val upserts = src.filter(!col("_delete")).drop("_delete")
      val survivors =
        if (affected.isEmpty) upserts
        else spark.read.parquet(affected.toSeq: _*)
          .join(src.select(col(key).cast("long").as(key)).distinct(),
            Seq(key), "left_anti")
          .unionByName(upserts, allowMissingColumns = false)
      val newEntries = writePool(spark, base, survivors, key,
        math.max(1, affected.size))
      beforeCommit()
      AtomicPublish.tryPublish(spark, base,
        Seq("manifest" -> manifestDf(spark, untouched ++ newEntries)),
        retain, parent) match {
        case Some(v) => result = v
        case None => () // conflict: recompute against the new committed
      }
    }
    result
  }

  /** DELETE WHERE: rewrites only the files that CONTAIN a matching row
    * (one pruned discovery scan finds them), referencing the rest. */
  def deleteWhere(spark: SparkSession, base: String, pred: Column,
                  key: String, retain: Int = 1): Long = {
    var result = -1L
    while (result < 0) {
      val parent = AtomicPublish.committed(spark, base)
      require(parent >= 0, s"no committed version under $base")
      val entries = entriesAt(spark, base, parent)
      if (entries.isEmpty) return parent
      val data = spark.read.parquet(entries.map(_.file): _*)
      val hit = data.filter(pred).select(fileCol.as("f"))
        .distinct().collect().map(_.getString(0)).toSet // file-count bounded
      if (hit.isEmpty) return parent // no-op: nothing matches
      val untouched = entries.filterNot(e => hit.contains(e.file))
      val survivors = spark.read.parquet(hit.toSeq: _*).filter(!pred)
      val newEntries = writePool(spark, base, survivors, key, hit.size)
      AtomicPublish.tryPublish(spark, base,
        Seq("manifest" -> manifestDf(spark, untouched ++ newEntries)),
        retain, parent) match {
        case Some(v) => result = v
        case None => ()
      }
    }
    result
  }

  /** OPTIMIZE: bin-pack adjacent (by key range) undersized files into
    * ~`targetRows` files. Files already at target — and any group of
    * one — are referenced untouched; only multi-file groups rewrite.
    * Decided entirely from manifest row counts: no data is read to
    * PLAN the compaction, only the rewritten groups are read to DO it.
    */
  def compact(spark: SparkSession, base: String, targetRows: Long,
              key: String, retain: Int = 1): Long = {
    var result = -1L
    while (result < 0) {
      val parent = AtomicPublish.committed(spark, base)
      require(parent >= 0, s"no committed version under $base")
      val entries = entriesAt(spark, base, parent).sortBy(e => (e.kmin, e.file))
      val groups = entries.foldLeft(List.empty[List[Entry]]) {
        case (acc, e) if acc.nonEmpty &&
          acc.head.map(_.rows).sum + e.rows <= targetRows =>
          (e :: acc.head) :: acc.tail
        case (acc, e) => List(e) :: acc
      }.map(_.reverse).reverse
      val (rewrite, keep) = groups.partition(_.size > 1)
      if (rewrite.isEmpty) return parent // already compact: no-op
      // one range-partitioned job over every rewritten group: the write
      // parallelizes across the output files (a per-group loop would
      // serialize on the biggest group) and the re-sort restores tight,
      // non-overlapping key ranges for future manifest pruning
      val newEntries = writePool(spark, base,
        spark.read.parquet(rewrite.flatten.map(_.file): _*), key,
        numFiles = rewrite.size)
      AtomicPublish.tryPublish(spark, base,
        Seq("manifest" -> manifestDf(spark, keep.flatten ++ newEntries)),
        retain, parent) match {
        case Some(v) => result = v
        case None => ()
      }
    }
    result
  }

  /** Reclaim pool files referenced by NO retained version's manifest
    * (superseded rewrites, losers of commit races). Returns the number
    * deleted. Must not race an in-flight writer — stage-then-commit
    * means a writer's new files are unreferenced until its manifest
    * lands; `graceMs` skips files younger than the longest write as the
    * standard guard. */
  def vacuum(spark: SparkSession, base: String, graceMs: Long = 0L): Int = {
    val fs = fsOf(spark, base)
    val referenced = AtomicPublish.versions(spark, base)
      .flatMap(v => entriesAt(spark, base, v).map(_.file)).toSet
    val pool = new Path(base, "files")
    if (!fs.exists(pool)) return 0
    val now = System.currentTimeMillis()
    val doomed = fs.listStatus(pool).toSeq
      .filter(st => !referenced.contains(norm(st.getPath.toString)) &&
        now - st.getModificationTime >= graceMs)
    doomed.foreach(st => fs.delete(st.getPath, false))
    doomed.size
  }

  // -------------------------------------------------------------------
  // Registered checks (driver contract)
  // -------------------------------------------------------------------

  /** The deterministic merge batch both checks and both oracles share:
    * updates (+10.0 on every 97th key), deletes (every 101st key ≡ 3),
    * inserts (every 103rd key ≡ 5, re-keyed past max, status 'I'). */
  private def mergeBatch(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
    val mx = orders.agg(max("o_orderkey")).head().getLong(0)
    val k = col("o_orderkey")
    val upd = orders.filter(k % 97 === 0 && !(k % 101 === 3))
      .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
      .withColumn("_delete", lit(false))
    val ins = orders.filter(k % 103 === 5)
      .withColumn("o_orderkey", k + lit(mx))
      .withColumn("o_orderstatus", lit("I"))
      .withColumn("_delete", lit(false))
    val del = orders.filter(k % 101 === 3).withColumn("_delete", lit(true))
    upd.unionByName(ins).unionByName(del)
  }

  private def statusAgg(df: DataFrame): DataFrame = df
    .groupBy(col("o_orderstatus"))
    .agg(count(lit(1)).as("n_orders"),
      sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("total"))
    .orderBy("o_orderstatus")

  /** MERGE end-to-end: build the table from orders, apply a RANGE-LOCAL
    * batch — updates/deletes confined to the lowest eighth of the key
    * space (`k*8 <= max`, integer math both engines share), inserts
    * re-keyed past max — and read the final snapshot back through the
    * manifest. Range-local is the representative production shape (a
    * late-arriving partition, a corrected tenant): the bench cost is
    * the ONE affected file plus the insert file, not the table, and an
    * in-band invariant holds the untouched files to their old pool
    * paths. The oracle replays the merge relationally, so the stored
    * table — not the in-flight computation — is what gets verified. */
  def mergeCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "cow_merge", dir, "cow_merge") {
      val base = FsUtil.stateDir("cow_merge", dir)
      fsOf(spark, base).delete(new Path(base), true) // self-contained
      val orders = graft.Tables.orders(spark, dir)
      create(spark, base, orders, "o_orderkey", numFiles = 8)
      val pre = manifest(spark, base).map(_.file).toSet

      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      val k = col("o_orderkey")
      val lo = k * 8 <= lit(mx)
      val upd = orders.filter(lo && k % 7 === 0 && !(k % 11 === 3))
        .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
        .withColumn("_delete", lit(false))
      val ins = orders.filter(k % 103 === 5)
        .withColumn("o_orderkey", k + lit(mx))
        .withColumn("o_orderstatus", lit("I"))
        .withColumn("_delete", lit(false))
      val del = orders.filter(lo && k % 11 === 3)
        .withColumn("_delete", lit(true))
      merge(spark, base, upd.unionByName(ins).unionByName(del), "o_orderkey")

      val referenced = manifest(spark, base).map(_.file).toSet.intersect(pre)
      require(referenced.size >= 5,
        s"a range-local merge must reference most files untouched, " +
          s"kept only ${referenced.size}/8")
      statusAgg(read(spark, base))
    }

  val mergeSql: String =
    """WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
      |final AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey * 8 <= m AND o_orderkey % 7 = 0
      |              THEN o_totalprice + 10.0 ELSE o_totalprice
      |         END AS o_totalprice,
      |         o_orderstatus
      |  FROM orders, mx
      |  WHERE NOT (o_orderkey * 8 <= m AND o_orderkey % 11 = 3)
      |  UNION ALL
      |  SELECT o_orderkey + m, o_totalprice, 'I'
      |  FROM orders, mx WHERE o_orderkey % 103 = 5
      |)
      |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |            AS DECIMAL(18,2)) AS total
      |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  /** The full row-level lifecycle on one table: create → MERGE →
    * DELETE WHERE (drops the inserted 'I' rows) → compact → vacuum.
    * In-band invariants: compaction must shrink the file count while
    * vacuum must reclaim the superseded rewrites, and the final
    * snapshot is read back through the compacted manifest. */
  def lifecycleCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "cow_lifecycle", dir, "cow_life") {
      val base = FsUtil.stateDir("cow_life", dir)
      fsOf(spark, base).delete(new Path(base), true) // self-contained
      create(spark, base, graft.Tables.orders(spark, dir),
        "o_orderkey", numFiles = 8)
      merge(spark, base, mergeBatch(spark, dir), "o_orderkey")
      deleteWhere(spark, base, col("o_orderstatus") === "I", "o_orderkey")
      val m0 = manifest(spark, base)
      val before = m0.size
      // pack to quarter-table files: a multi-file parallel write at any
      // SF, unlike a pack-to-one target that serializes on one task
      compact(spark, base,
        targetRows = math.max(1L, m0.map(_.rows).sum / 4), "o_orderkey")
      val after = manifest(spark, base).size
      require(after < before, s"compact must shrink files: $before -> $after")
      val reclaimed = vacuum(spark, base)
      require(reclaimed > 0, "vacuum must reclaim superseded pool files")
      statusAgg(read(spark, base))
    }

  val lifecycleSql: String =
    """WITH final AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 97 = 0
      |              THEN o_totalprice + 10.0 ELSE o_totalprice
      |         END AS o_totalprice,
      |         o_orderstatus
      |  FROM orders WHERE o_orderkey % 101 <> 3
      |)
      |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |            AS DECIMAL(18,2)) AS total
      |FROM final WHERE o_orderstatus <> 'I'
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
