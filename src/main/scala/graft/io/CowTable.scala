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
  *
  * Two merge-on-read extensions complete the row-level story:
  *   - DELETION VECTORS ([[dvDelete]]): a scattered DELETE (GDPR purge,
  *     every-Nth-key retention) touching every file would make
  *     copy-on-write rewrite the whole table. A DV delete instead
  *     writes only the (file, row position) pairs of the doomed rows —
  *     O(deleted rows) bytes — and the new manifest points each
  *     affected file at its cumulative vector; NO data file is
  *     rewritten. Reads subtract the vectors (anti-join on position,
  *     broadcast whenever the manifest's dvRows total proves it small);
  *     [[compact]] materializes them back to clean files. The same
  *     design as Delta deletion vectors / Iceberg position deletes.
  *   - CHANGE DATA FEED ([[changes]]): the row-level diff between two
  *     committed versions, computed from the files present in exactly
  *     one manifest — O(changed files), never a two-snapshot scan. Rows
  *     co-located in a rewritten file but untouched by the change
  *     compare struct-equal pre/post and drop out as no-ops.
  *
  * Commits can carry an idempotence TXN stamp (stream id → batch id,
  * carried forward across versions) so a Structured Streaming
  * foreachBatch writer gets exactly-once MERGE semantics across
  * checkpoint replays ([[exactlyOnceMerge]]).
  */
object CowTable {

  case class Entry(file: String, rows: Long, kmin: Long, kmax: Long,
                   dv: String = "", dvRows: Long = 0L)

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
    var df = AtomicPublish.readVersion(spark, base, "manifest", version)
    // pre-DV manifests lack the vector columns; absent = no deletions
    if (!df.columns.contains("dv")) df = df.withColumn("dv", lit(""))
    if (!df.columns.contains("dvRows")) df = df.withColumn("dvRows", lit(0L))
    df.as[Entry].collect().toSeq // file-count bounded
  }

  /** `_metadata.file_path` with the scheme stripped — the row's physical
    * file in the manifest's stored form, paired with `row_index` to
    * address a row without any table-level id. */
  private def lineageCols(df: DataFrame): DataFrame = df
    .withColumn("_gf_file",
      regexp_replace(col("_metadata.file_path"), "^file:/+", "/"))
    .withColumn("_gf_pos", col("_metadata.row_index"))

  /** Live rows of `entries`: the raw pool scan minus each file's
    * deletion vector. The anti-join side is broadcast exactly when the
    * manifest's own dvRows total proves it bounded — metadata, not a
    * guess. With `lineage` the (file, position) address columns are
    * kept for callers that need to write vectors or discover files. */
  private def scanEntries(spark: SparkSession, entries: Seq[Entry],
                          lineage: Boolean = false): DataFrame = {
    require(entries.nonEmpty, "scanEntries on an empty manifest")
    val raw = lineageCols(spark.read.parquet(entries.map(_.file): _*))
    val dvd = entries.filter(_.dv.nonEmpty)
    val live =
      if (dvd.isEmpty) raw
      else {
        // restrict shared vector files to THIS manifest's entries (an
        // IN filter parquet can push): stale positions for rewritten
        // files never match anyway, but dropping them makes the scanned
        // row count exactly the manifest's dvRows total — which is then
        // a PROVEN broadcast bound, not an estimate
        val dv = spark.read.parquet(dvd.map(_.dv).distinct: _*)
          .where(col("file").isin(dvd.map(_.file): _*)) // file-count bounded
        raw.join(graft.Bcast.ifBounded(dv, dvd.map(_.dvRows).sum),
          raw("_gf_file") === dv("file") && raw("_gf_pos") === dv("pos"),
          "left_anti")
      }
    if (lineage) live else live.drop("_gf_file", "_gf_pos")
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
    else scanEntries(spark, entries)
  }

  /** Manifest of the committed snapshot. */
  def manifest(spark: SparkSession, base: String): Seq[Entry] =
    entriesAt(spark, base, AtomicPublish.committed(spark, base))

  /** Time-travel snapshot: the table AS OF `version`, read through that
    * version's deletion vectors. Only retained versions are readable
    * (pruned/partial versions fail fast in [[AtomicPublish.readVersion]]).
    */
  def readAt(spark: SparkSession, base: String, version: Long): DataFrame = {
    val entries = entriesAt(spark, base, version)
    if (entries.isEmpty) // preserve schema even for an emptied snapshot
      spark.read.parquet(s"$base/v$version/manifest").limit(0)
    else scanEntries(spark, entries)
  }

  /** Point-lookup read: snapshot rows whose key range MAY contain one of
    * `keys` (first column, cast long) — the merge discovery join reused
    * as a reader, so a k-key probe scans only the intersecting files,
    * never the table. */
  def readForKeys(spark: SparkSession, base: String, keys: DataFrame,
                  key: String): DataFrame = {
    val v = AtomicPublish.committed(spark, base)
    require(v >= 0, s"no committed version under $base")
    val entries = entriesAt(spark, base, v)
    if (entries.isEmpty) return read(spark, base) // schema-only frame
    val kDf = keys.select(col(keys.columns.head).cast("long").as("_gf_k"))
      .distinct()
    val mDf = manifestDf(spark, entries)
    val hit = kDf
      .join(graft.Bcast.ifBounded(mDf, entries.size.toLong),
        col("_gf_k") >= col("kmin") && col("_gf_k") <= col("kmax"))
      .select("file").distinct().collect().map(_.getString(0)).toSet
    if (hit.isEmpty) scanEntries(spark, entries.take(1)).limit(0)
    else scanEntries(spark, entries.filter(e => hit.contains(e.file)))
  }

  /** Txn stamps of version `v`: (stream id, last applied batch id). */
  private def txnsAt(spark: SparkSession, base: String,
                     v: Long): Seq[(String, Long)] = {
    if (v < 0) return Seq.empty
    val p = new Path(base, s"v$v/txn")
    if (!fsOf(spark, base).exists(p)) Seq.empty
    else AtomicPublish.readVersion(spark, base, "txn", v)
      .select("stream", "batch").collect() // stream-count bounded
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Highest batch id the named stream committed into this table, −1 if
    * none — the replay-idempotence test for [[exactlyOnceMerge]]. */
  def lastTxn(spark: SparkSession, base: String, stream: String): Long =
    txnsAt(spark, base, AtomicPublish.committed(spark, base))
      .collect { case (s, b) if s == stream => b }
      .foldLeft(-1L)(math.max)

  /** Version payload: the manifest plus the txn table — the PARENT's
    * stamps carried forward on every commit (compaction or another
    * stream's merge must never erase a writer's idempotence marker),
    * updated when this commit is itself stamped. The txn table is
    * O(streams): collected and rewritten wholesale each version. */
  private def payload(spark: SparkSession, base: String, parent: Long,
                      entries: Seq[Entry], txn: Option[(String, Long)]
                     ): Seq[(String, DataFrame)] = {
    import spark.implicits._
    val carried = txnsAt(spark, base, parent)
    val updated = txn match {
      case None => carried
      case Some((s, b)) => carried.filterNot(_._1 == s) :+ ((s, b))
    }
    Seq("manifest" -> manifestDf(spark, entries)) ++
      (if (updated.isEmpty) Seq.empty
       else Seq("txn" -> updated.toDF("stream", "batch")))
  }

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
            beforeCommit: () => Unit = () => (),
            txn: Option[(String, Long)] = None): Long = {
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
        // DV-aware: a rewritten file's vectored-out rows must not
        // resurrect, so affected files are read through their vectors
        else scanEntries(spark, entries.filter(e => affected.contains(e.file)))
          .join(src.select(col(key).cast("long").as(key)).distinct(),
            Seq(key), "left_anti")
          .unionByName(upserts, allowMissingColumns = false)
      val newEntries = writePool(spark, base, survivors, key,
        math.max(1, affected.size))
      beforeCommit()
      AtomicPublish.tryPublish(spark, base,
        payload(spark, base, parent, untouched ++ newEntries, txn),
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
      val data = scanEntries(spark, entries, lineage = true)
      val hit = data.filter(pred).select(col("_gf_file"))
        .distinct().collect().map(_.getString(0)).toSet // file-count bounded
      if (hit.isEmpty) return parent // no-op: nothing matches
      val untouched = entries.filterNot(e => hit.contains(e.file))
      val survivors =
        scanEntries(spark, entries.filter(e => hit.contains(e.file)))
          .filter(!pred)
      val newEntries = writePool(spark, base, survivors, key, hit.size)
      AtomicPublish.tryPublish(spark, base,
        payload(spark, base, parent, untouched ++ newEntries, None),
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
      def liveRows(e: Entry): Long = e.rows - e.dvRows // logical size
      val groups = entries.foldLeft(List.empty[List[Entry]]) {
        case (acc, e) if acc.nonEmpty &&
          acc.head.map(liveRows).sum + liveRows(e) <= targetRows =>
          (e :: acc.head) :: acc.tail
        case (acc, e) => List(e) :: acc
      }.map(_.reverse).reverse
      // rewrite multi-file groups AND any deletion-vectored file:
      // compaction is where merge-on-read debt is repaid, leaving every
      // surviving file vector-free (the DSv2 serving contract)
      val (rewrite, keep) = groups.partition(g =>
        g.size > 1 || g.exists(_.dvRows > 0))
      if (rewrite.isEmpty) return parent // already compact: no-op
      // one range-partitioned job over every rewritten group: the write
      // parallelizes across the output files (a per-group loop would
      // serialize on the biggest group) and the re-sort restores tight,
      // non-overlapping key ranges for future manifest pruning
      val newEntries = writePool(spark, base,
        scanEntries(spark, rewrite.flatten), key,
        numFiles = rewrite.size)
      AtomicPublish.tryPublish(spark, base,
        payload(spark, base, parent, keep.flatten ++ newEntries, None),
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
      .flatMap(v => entriesAt(spark, base, v)
        .flatMap(e => Seq(e.file, e.dv).filter(_.nonEmpty))).toSet
    val pool = new Path(base, "files")
    if (!fs.exists(pool)) return 0
    val now = System.currentTimeMillis()
    val doomed = fs.listStatus(pool).toSeq
      .filter(st => !referenced.contains(norm(st.getPath.toString)) &&
        now - st.getModificationTime >= graceMs)
    doomed.foreach(st => fs.delete(st.getPath, true)) // dv entries are dirs
    doomed.size
  }

  /** DELETE by DELETION VECTOR (merge-on-read): writes only the (file,
    * row position) pairs of the matching LIVE rows — O(deleted rows)
    * bytes, ZERO data files rewritten — and points each affected file's
    * manifest entry at its new cumulative vector. The inverse trade of
    * [[deleteWhere]]: a delete scattered across every file costs a
    * table rewrite copy-on-write but only its own row count here;
    * [[compact]] repays the read-side debt by materializing vectors.
    * Returns the committed version (the parent when nothing matched).
    */
  def dvDelete(spark: SparkSession, base: String, pred: Column,
               retain: Int = 1): Long = {
    var result = -1L
    while (result < 0) {
      val parent = AtomicPublish.committed(spark, base)
      require(parent >= 0, s"no committed version under $base")
      val entries = entriesAt(spark, base, parent)
      if (entries.isEmpty) return parent
      val hits = scanEntries(spark, entries, lineage = true).filter(pred)
        .select(col("_gf_file").as("file"), col("_gf_pos").as("pos"))
        .localCheckpoint() // evaluated once: counts, union, write
      val perFile = hits.groupBy("file").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // file-bounded
      if (perFile.isEmpty) return parent // no-op: nothing matches
      // cumulative vector per affected file: prior positions + new hits
      val oldDv = entries
        .filter(e => perFile.contains(e.file) && e.dv.nonEmpty)
      val allRows =
        if (oldDv.isEmpty) hits
        else hits.unionByName(
          spark.read.parquet(oldDv.map(_.dv).distinct: _*)
            .where(col("file").isin(oldDv.map(_.file): _*)))
      val fs = fsOf(spark, base)
      val token = java.util.UUID.randomUUID().toString
      val tmp = new Path(base, s".dv-$token")
      allRows.write.mode("overwrite").parquet(tmp.toString)
      val dst = new Path(base, s"files/$token-dv")
      fs.mkdirs(new Path(base, "files"))
      require(fs.rename(tmp, dst), s"dv move failed: $tmp -> $dst")
      val dvPath = norm(dst.toString)
      val cum = entries.map(e => perFile.get(e.file) match {
        case Some(n) => e.copy(dv = dvPath, dvRows = e.dvRows + n)
        case None => e
      })
      AtomicPublish.tryPublish(spark, base,
        payload(spark, base, parent, cum, None), retain, parent) match {
        case Some(v) => result = v
        case None => () // conflict: recompute against the new committed
      }
    }
    result
  }

  /** CHANGE DATA FEED: the row-level diff between two committed
    * versions, computed from the files present in exactly one manifest
    * — O(changed files + their vectors), never a two-snapshot scan. A
    * file is "same" only as (file, dv): a vector added to an untouched
    * file IS a change and both sides read through their own vectors.
    * Rows co-located in a rewritten file but themselves untouched
    * compare struct-equal across the key join and drop out as no-ops.
    * Output: the data columns (post-image; pre-image for deletes) plus
    * `_change_type` ∈ insert / update / delete. Requires both versions
    * readable (`retain` ≥ the travel distance). */
  def changes(spark: SparkSession, base: String, fromV: Long, toV: Long,
              key: String): DataFrame = {
    require(fromV <= toV, s"changes: from $fromV > to $toV")
    val from = entriesAt(spark, base, fromV)
    val to = entriesAt(spark, base, toV)
    def id(e: Entry) = (e.file, e.dv)
    val toIds = to.map(id).toSet
    val fromIds = from.map(id).toSet
    val preEntries = from.filterNot(e => toIds.contains(id(e)))
    val postEntries = to.filterNot(e => fromIds.contains(id(e)))
    val anyEntry = (preEntries ++ postEntries ++ to ++ from).headOption
      .getOrElse(sys.error(s"changes: no entries in either version of $base"))
    val dataCols = spark.read.parquet(anyEntry.file).columns.toSeq
    def side(entries: Seq[Entry], name: String): DataFrame = {
      val df =
        if (entries.isEmpty)
          scanEntries(spark, Seq(anyEntry)).limit(0) // schema-only
        else scanEntries(spark, entries)
      df.select(col(key).cast("long").as("_gf_k"),
        struct(dataCols.map(col): _*).as(name))
    }
    val pre = side(preEntries, "_pre")
    val post = side(postEntries, "_post")
    val img = coalesce(col("_post"), col("_pre"))
    pre.join(post, Seq("_gf_k"), "full_outer")
      .withColumn("_change_type",
        when(col("_pre").isNull, "insert")
          .when(col("_post").isNull, "delete")
          .when(!(col("_pre") <=> col("_post")), "update")
          .otherwise("noop"))
      .filter(col("_change_type") =!= "noop")
      .select(dataCols.map(c => img.getField(c).as(c)) :+
        col("_change_type"): _*)
  }

  /** CDC CURSOR: every row-level change committed AFTER `sinceV`, each
    * tagged with its commit version — what a downstream consumer polls
    * between syncs. Cost is the sum of the per-version [[changes]]
    * diffs: O(churn since the cursor), never a snapshot. The span must
    * be retained (`retain` ≥ distance at write time); a pruned version
    * inside the span fails fast rather than silently skipping commits —
    * the same contract as the commit-log stream. */
  def changesSince(spark: SparkSession, base: String, sinceV: Long,
                   key: String): DataFrame = {
    val vs = AtomicPublish.versions(spark, base).filter(_ > sinceV)
    require(vs.nonEmpty, s"no committed versions after $sinceV under $base")
    require(vs.head == sinceV + 1,
      s"versions ${sinceV + 1}..${vs.head - 1} are pruned; the cursor " +
        "cannot skip commits — retain a window covering the poll interval")
    vs.map(v => changes(spark, base, v - 1, v, key)
        .withColumn("_commit_version", lit(v)))
      .reduce(_ unionByName _)
  }

  /** Exactly-once MERGE for a Structured Streaming foreachBatch writer:
    * the commit is stamped (stream, batchId) and a replay of an
    * already-applied batch — checkpoint recovery re-delivers the last
    * uncommitted-at-crash batch — is detected from the stamp and
    * SKIPPED, so the merge applies exactly once no matter how many
    * times the sink retries. Bootstraps the table from the first batch.
    */
  def exactlyOnceMerge(spark: SparkSession, base: String, source: DataFrame,
                       key: String, stream: String, batchId: Long,
                       retain: Int = 1): Long = {
    if (!AtomicPublish.exists(spark, base)) {
      val upserts = (if (source.columns.contains("_delete"))
        source.filter(!col("_delete")).drop("_delete") else source)
      val entries = writePool(spark, base, upserts, key, numFiles = 1)
      import spark.implicits._
      AtomicPublish.publish(spark, base,
        Seq("manifest" -> manifestDf(spark, entries),
          "txn" -> Seq((stream, batchId)).toDF("stream", "batch")), retain)
    } else if (lastTxn(spark, base, stream) >= batchId) {
      AtomicPublish.committed(spark, base) // replay: already applied
    } else {
      merge(spark, base, source, key, retain, txn = Some((stream, batchId)))
    }
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
      // exact decimal arithmetic inside, ONE final cast: the driver
      // comparator hash-fails on DECIMAL output columns (ParitySpec)
      sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").cast("double").as("total"))
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
  /** The RANGE-LOCAL batch [[mergeCheck]] and [[changesCheck]] share:
    * updates/deletes confined to the lowest eighth of the key space
    * (`k*8 <= max`, integer math both engines share), inserts re-keyed
    * past max with status 'I'. */
  private def rangeLocalBatch(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
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
    upd.unionByName(ins).unionByName(del)
  }

  def mergeCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "cow_merge", dir, "cow_merge") {
      val base = FsUtil.stateDir("cow_merge", dir)
      fsOf(spark, base).delete(new Path(base), true) // self-contained
      val orders = graft.Tables.orders(spark, dir)
      create(spark, base, orders, "o_orderkey", numFiles = 8)
      val pre = manifest(spark, base).map(_.file).toSet

      merge(spark, base, rangeLocalBatch(spark, dir), "o_orderkey")

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
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |                 AS DECIMAL(18,2)) AS DOUBLE) AS total
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
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |                 AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM final WHERE o_orderstatus <> 'I'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** DELETION-VECTOR end-to-end: two cumulative DV deletes — the first
    * scattered across EVERY file (`k % 13`), the worst case that would
    * force copy-on-write to rewrite the whole table — with an in-band
    * invariant that ZERO data files were rewritten; then the snapshot is
    * aggregated THROUGH the vectors, compaction materializes them
    * (invariant: no vector survives), vacuum reclaims the superseded
    * pool, and the post-compaction aggregate must equal the
    * merge-on-read one bit-for-bit. The oracle replays both deletes
    * relationally against the source table. */
  def dvCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "cow_dv", dir, "cow_dv") {
      val base = FsUtil.stateDir("cow_dv", dir)
      fsOf(spark, base).delete(new Path(base), true) // self-contained
      create(spark, base, graft.Tables.orders(spark, dir),
        "o_orderkey", numFiles = 8)
      val pre = manifest(spark, base).map(_.file).toSet
      val k = col("o_orderkey")
      dvDelete(spark, base, k % 13 === 0)
      dvDelete(spark, base, col("o_orderstatus") === "O" && k % 17 === 3)
      val m = manifest(spark, base)
      require(m.map(_.file).toSet == pre,
        "a scattered DV delete must rewrite ZERO data files")
      require(m.forall(_.dvRows > 0),
        "every file holds multiples of 13 at any SF: all must be vectored")
      val onRead = statusAgg(read(spark, base)).collect().toSeq
      compact(spark, base,
        targetRows = math.max(1L, m.map(e => e.rows - e.dvRows).sum / 4),
        "o_orderkey")
      val m2 = manifest(spark, base)
      require(m2.forall(_.dvRows == 0L),
        "compact must materialize every deletion vector")
      require(vacuum(spark, base) > 0,
        "vacuum must reclaim superseded files and vectors")
      val materialized = statusAgg(read(spark, base))
      require(materialized.collect().toSeq == onRead,
        "merge-on-read and materialized snapshots must agree")
      materialized
    }

  val dvSql: String =
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |                 AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM orders
      |WHERE NOT (o_orderkey % 13 = 0)
      |  AND NOT (o_orderstatus = 'O' AND o_orderkey % 17 = 3)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** CHANGE DATA FEED end-to-end: create → range-local MERGE with the
    * table retaining both versions → [[changes]] between them, rolled
    * up by change type. Only the files present in exactly one manifest
    * are read (in-band: the diff itself proves it — co-located no-op
    * rows drop out by struct equality, so a full-snapshot diff and the
    * changed-file diff agree, but the cost is O(changed files)). The
    * oracle derives the same feed from the batch's arithmetic. */
  def changesCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "cow_changes", dir, "cow_changes") {
      val base = FsUtil.stateDir("cow_changes", dir)
      fsOf(spark, base).delete(new Path(base), true) // self-contained
      val v0 = create(spark, base, graft.Tables.orders(spark, dir),
        "o_orderkey", numFiles = 8, retain = 3)
      val v1 = merge(spark, base, rangeLocalBatch(spark, dir),
        "o_orderkey", retain = 3)
      changes(spark, base, v0, v1, "o_orderkey")
        .groupBy(col("_change_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)").cast("double").as("image_total"))
        .orderBy("_change_type")
    }

  val changesSql: String =
    """WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders)
      |SELECT * FROM (
      |  SELECT 'delete' AS _change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |                 AS DECIMAL(18,2)) AS DOUBLE) AS image_total
      |  FROM orders, mx WHERE o_orderkey * 8 <= m AND o_orderkey % 11 = 3
      |  UNION ALL
      |  SELECT 'insert', CAST(COUNT(*) AS BIGINT),
      |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |                 AS DECIMAL(18,2)) AS DOUBLE)
      |  FROM orders WHERE o_orderkey % 103 = 5
      |  UNION ALL
      |  SELECT 'update', CAST(COUNT(*) AS BIGINT),
      |         CAST(CAST(SUM(CAST(o_totalprice + 10.0 AS DECIMAL(18,2)))
      |                 AS DECIMAL(18,2)) AS DOUBLE)
      |  FROM orders, mx
      |  WHERE o_orderkey * 8 <= m AND o_orderkey % 7 = 0
      |    AND NOT o_orderkey % 11 = 3
      |) AS feed ORDER BY 1""".stripMargin

  /** CDC REPLAY COMPLETENESS: a consumer that starts from the v0
    * snapshot ([[readAt]]) and folds [[changesSince]] version by version
    * — delete the deleted keys, upsert the insert/update images — must
    * reproduce the final table EXACTLY, across all three write paths
    * (copy-on-write MERGE, deletion-vector delete, copy-on-write
    * DELETE WHERE). The in-band require compares the folded snapshot's
    * aggregate to the direct read bit-for-bit; the oracle replays the
    * same history relationally. This is the contract a downstream CDC
    * consumer (a replica, a search index, a cache) actually needs: no
    * missed row, no double-applied row, vectors and rewrites included.
    */
  def cdfReplayCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "cow_cdf_replay", dir, "cow_cdf") {
      val base = FsUtil.stateDir("cow_cdf", dir)
      fsOf(spark, base).delete(new Path(base), true) // self-contained
      val v0 = create(spark, base, graft.Tables.orders(spark, dir),
        "o_orderkey", numFiles = 8, retain = 8)
      merge(spark, base, rangeLocalBatch(spark, dir),
        "o_orderkey", retain = 8) // v1: COW merge
      dvDelete(spark, base, col("o_orderkey") % 19 === 7,
        retain = 8) // v2: merge-on-read delete
      deleteWhere(spark, base, col("o_orderstatus") === "I",
        "o_orderkey", retain = 8) // v3: COW delete (drops the inserts)

      val feed = changesSince(spark, base, v0, "o_orderkey")
        .localCheckpoint() // one computation, sliced per version below
      var snap = readAt(spark, base, v0)
      AtomicPublish.versions(spark, base).filter(_ > v0).foreach { v =>
        val ch = feed.filter(col("_commit_version") === v)
        val ups = ch.filter(col("_change_type") =!= "delete")
          .drop("_change_type", "_commit_version")
        snap = snap
          .join(ch.select(col("o_orderkey")).distinct(),
            Seq("o_orderkey"), "left_anti")
          .unionByName(ups)
      }
      val folded = statusAgg(snap).collect().toSeq
      val direct = statusAgg(read(spark, base))
      require(direct.collect().toSeq == folded,
        "the folded change feed must reproduce the final snapshot")
      direct
    }

  val cdfReplaySql: String =
    """WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
      |v1 AS (
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
      |),
      |v2 AS (SELECT * FROM v1 WHERE NOT o_orderkey % 19 = 7),
      |v3 AS (SELECT * FROM v2 WHERE o_orderstatus <> 'I')
      |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |                 AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM v3 GROUP BY 1 ORDER BY 1""".stripMargin
}
