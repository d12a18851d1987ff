package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Z-order (Morton-curve) file layout — the multi-column data-skipping
  * technique lakehouse table formats expose as OPTIMIZE ZORDER BY
  * (Morton 1966; public technique): interleaving the bits of two sort
  * keys makes every contiguous file span a bounded RECTANGLE in
  * (key1, key2) space, so per-file min/max statistics prune scans on
  * EITHER predicate column. A single-column sort gives perfect pruning
  * on that column and none on the other — at 100 TB the difference is
  * whether a `WHERE user_id = ? AND day = ?` probe reads one file or
  * every file.
  *
  * Each key is first NORMALIZED to the full 2^[[bits]] grid via its
  * exact integer min/max — `(x − min) · 2^bits ÷ (max − min + 1)` —
  * because Morton codes on raw values degenerate when one key's range
  * occupies only low bits (its high interleaved bits are constant and
  * the file split, which reads the TOP bits, reduces to a single-key
  * sort; this is why every production z-order implementation range-maps
  * its columns first). The min/max pair is a one-row exact-integer
  * aggregate, broadcast — deterministic, so the oracle replays it.
  *
  * The registered query materializes the comparison a table optimizer
  * would publish: events bucketed into `files` equal-width ranges under
  * two layouts — `user_sort` (single-key) and `zorder` — with per-file
  * (user span × day span) footprints. The spec asserts the claim that
  * matters: z-order bounds BOTH spans; the single-key layout leaves the
  * day span at full width.
  *
  * Everything is integer arithmetic (`shiftright` / `& 1` here,
  * `// 2^i % 2` in the oracle), so the two engines cannot diverge.
  * Bucketing is by fixed z-range, not equal-count ntile — a global
  * ntile needs a single-partition window (the anti-pattern [[Pack]]
  * exists to avoid), and range-partition boundaries from sampling are
  * nondeterministic; fixed ranges keep the whole report
  * oracle-checkable, at the cost of uneven file sizes (reported, not
  * hidden). One scan + one one-row bounds aggregate + one
  * (layout, file) aggregate — scan-bound.
  */
object Layout {

  /** Bits per dimension in the Morton code (8 → 65,536 cells). */
  val bits = 8

  private def zval(u: Column, d: Column): Column =
    (0 until bits).map { i =>
      shiftright(u, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(d, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The reusable N-dimension Morton code over `cols` with exact integer
    * `bounds` — what `CALL graft.compact(zorder => …)` re-clusters a cow
    * table's files by. Each column is normalized to the 2^[[bits]] grid
    * via its (min, max) bound (see the class doc for why raw values
    * degenerate), nulls clustering at the low edge; bits interleave
    * round-robin across dimensions. Bound guard: (span · grid) must stay
    * under 2^53 so the normalization's double division is exact —
    * enforced, never silent. */
  def morton(cols: Seq[Column], bounds: Seq[(Long, Long)]): Column = {
    require(cols.nonEmpty && cols.size == bounds.size,
      "morton: one (min,max) bound per column")
    require(cols.size * bits <= 62,
      s"morton: ${cols.size} dimensions x $bits bits overflow a long")
    val grid = 1L << bits
    val normed = cols.zip(bounds).map { case (c, (lo, hi)) =>
      require(hi >= lo, s"morton: empty bound [$lo, $hi]")
      require((BigInt(hi) - BigInt(lo) + 1) * grid < BigInt(1L << 53),
        s"morton: span [$lo, $hi] too wide for exact grid normalization")
      val span = math.max(1L, hi - lo + 1L)
      (((coalesce(c.cast("long"), lit(lo)) - lit(lo)) * lit(grid)) /
        lit(span)).cast("long")
    }
    val n = cols.size
    (0 until bits).flatMap(i => normed.zipWithIndex.map { case (nc, d) =>
      shiftright(nc, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + d))
    }).reduce(_ + _)
  }

  /** (u, d, un, dn, zfile, ufile) — normalized cells + both layouts'
    * file assignments, the shared input of the footprint report and the
    * measured-skipping write.
    */
  private def taggedCells(spark: SparkSession, dir: String, files: Int): DataFrame = {
    // integer `div`, not float division: exact at any epoch magnitude
    val day = expr("unix_micros(ts) div 86400000000")
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("u"), day.as("d"))
    val bounds = ev.agg(min("u").as("umin"), max("u").as("umax"),
      min("d").as("dmin"), max("d").as("dmax"))
    val grid = 1L << bits
    val withB = ev.crossJoin(Bcast.ifBounded(bounds, Bcast.OneRow))
      .select(col("u"), col("d"),
        expr(s"(u - umin) * $grid div (umax - umin + 1)").as("un"),
        expr(s"(d - dmin) * $grid div (dmax - dmin + 1)").as("dn"))
    val z = zval(col("un"), col("dn"))
    val zmax = 1L << (2 * bits)
    withB.select(col("u"), col("d"), col("un"), col("dn"),
      (z * files / zmax).cast("int").as("zfile"),
      (col("un") * files / grid).cast("int").as("ufile"))
  }

  /** Per-(layout, file) footprint report: row count and the min/max span
    * of both predicate columns inside each file (spans in RAW key units).
    */
  def zorderReport(spark: SparkSession, dir: String, files: Int = 16): DataFrame =
    // one scan for both layouts: tag-explode each row into its two
    // (layout, file) memberships, then a single grouped aggregate
    taggedCells(spark, dir, files)
      .select(col("u"), col("d"), explode(array(
        struct(lit("user_sort").as("layout"), col("ufile").as("file_id")),
        struct(lit("zorder").as("layout"), col("zfile").as("file_id")))).as("lf"))
      .groupBy(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        (max("u") - min("u")).as("user_span"),
        (max("d") - min("d")).as("day_span"))

  /** The 2-D box predicate of the skipping proof: the middle quarter of
    * each normalized dimension (u-quarter × d-quarter — selective on
    * BOTH keys, so single-key layouts must fall back on one dimension).
    */
  val boxLo = 64L
  val boxHi = 127L

  /** MEASURED data skipping — the third scan-elimination lever beside
    * bucketing and DPP (ScaleTechniquesSpec), proven on real files
    * rather than reported from footprints: both layouts are WRITTEN
    * (one parquet file per z-range/user-range bucket, file id as a
    * partition column), per-file min/max stats are collected at write
    * time (the Delta/Iceberg add-file-stats pattern — skipping decisions
    * come from a stats manifest, not from opening footers), and the 2-D
    * box predicate is answered by reading ONLY files whose stats
    * intersect the box. Per layout: total files, files scanned, rows
    * read from the surviving files, and the box rows they yield — the
    * z-ordered layout scans strictly fewer files AND rows for the same
    * (provably identical) answer, which is the OPTIMIZE ZORDER claim as
    * a measurement. At 100 TB files-scanned IS the query cost; the spec
    * additionally pins the physical file count to the manifest prune
    * via the scan's numFiles metric.
    */
  def zorderSkipping(spark: SparkSession, dir: String, files: Int = 16): DataFrame = {
    val base = graft.io.FsUtil.stateDir("zorder", dir)
    val tagged = taggedCells(spark, dir, files)
    val layouts = Seq("zorder" -> "zfile", "user_sort" -> "ufile")
    layouts.foreach { case (name, fcol) =>
      tagged.select(col("un"), col("dn"), col(fcol).as("file_id"))
        .repartition(col("file_id")) // one task per bucket → one file per dir
        .write.mode("overwrite").partitionBy("file_id")
        .parquet(s"$base/$name")
    }
    val rows = layouts.map { case (name, _) =>
      val layout = spark.read.parquet(s"$base/$name")
      // write-time stats manifest: per-file min/max of both keys
      val manifest = layout.groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("un").as("unmin"), max("un").as("unmax"),
          min("dn").as("dnmin"), max("dn").as("dnmax"))
        .collect()
      val surviving = manifest.filter { r =>
        r.getLong(3) >= boxLo && r.getLong(2) <= boxHi &&
          r.getLong(5) >= boxLo && r.getLong(4) <= boxHi
      }.map(_.getInt(0))
      // the pruned read: file_id is a partition column, so the isin
      // prunes at the listing — only surviving files are opened
      val pruned = layout.filter(col("file_id")
        .isin(surviving.map(Integer.valueOf).toSeq: _*))
      val scanned = pruned.count()
      val out = pruned
        .filter(col("un").between(boxLo, boxHi) &&
          col("dn").between(boxLo, boxHi))
        .count()
      (name, manifest.length.toLong, surviving.length.toLong, scanned, out)
    }
    import spark.implicits._
    rows.toDF("layout", "n_files", "n_files_scanned",
      "n_rows_scanned", "n_rows_out")
  }

  /** The shared `ev → bounds → normalize → tag` CTE prefix (`tagged`
    * carries un/dn plus both layouts' file ids) — the SQL twin of
    * [[taggedCells]].
    */
  private def taggedCteSql(files: Int): String = {
    val grid = 1L << bits
    val zterms = (0 until bits)
      .map(i => s"((un // ${1L << i}) % 2) * ${1L << (2 * i)} + ((dn // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
      .mkString(" + ")
    s"""ev AS (
       |  SELECT user_id AS u,
       |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d
       |  FROM events
       |), b AS (
       |  SELECT MIN(u) AS umin, MAX(u) AS umax, MIN(d) AS dmin, MAX(d) AS dmax
       |  FROM ev
       |), nrm AS (
       |  SELECT u, d,
       |         (u - umin) * $grid // (umax - umin + 1) AS un,
       |         (d - dmin) * $grid // (dmax - dmin + 1) AS dn
       |  FROM ev, b
       |), tagged AS (
       |  SELECT u, d, un, dn,
       |         CAST(($zterms) * $files // ${1L << (2 * bits)} AS INT) AS zfile,
       |         CAST(un * $files // $grid AS INT) AS ufile
       |  FROM nrm
       |)""".stripMargin
  }

  def zorderReportSql(files: Int = 16): String =
    s"""WITH ${taggedCteSql(files)}
       |SELECT 'user_sort' AS layout, ufile AS file_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       CAST(MAX(u) - MIN(u) AS BIGINT) AS user_span,
       |       CAST(MAX(d) - MIN(d) AS BIGINT) AS day_span
       |FROM tagged GROUP BY 2
       |UNION ALL
       |SELECT 'zorder' AS layout, zfile AS file_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       CAST(MAX(u) - MIN(u) AS BIGINT) AS user_span,
       |       CAST(MAX(d) - MIN(d) AS BIGINT) AS day_span
       |FROM tagged GROUP BY 2""".stripMargin

  /** Oracle: replay the bucket assignment, the write-time stats, and
    * the manifest-prune decision — the engine's measured counts must
    * equal this pure arithmetic or the write/prune path lost rows.
    */
  def zorderSkippingSql(files: Int = 16): String =
    s"""WITH ${taggedCteSql(files)}, stats AS (
       |  SELECT layout, file_id, COUNT(*) AS n_rows,
       |         MIN(un) AS unmin, MAX(un) AS unmax,
       |         MIN(dn) AS dnmin, MAX(dn) AS dnmax
       |  FROM (
       |    SELECT un, dn, 'zorder' AS layout, zfile AS file_id FROM tagged
       |    UNION ALL
       |    SELECT un, dn, 'user_sort', ufile FROM tagged
       |  ) GROUP BY 1, 2
       |), pruned AS (
       |  SELECT layout,
       |         CAST(COUNT(*) AS BIGINT) AS n_files,
       |         CAST(SUM(CASE WHEN unmax >= $boxLo AND unmin <= $boxHi
       |                        AND dnmax >= $boxLo AND dnmin <= $boxHi
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_files_scanned,
       |         CAST(SUM(CASE WHEN unmax >= $boxLo AND unmin <= $boxHi
       |                        AND dnmax >= $boxLo AND dnmin <= $boxHi
       |                       THEN n_rows ELSE 0 END) AS BIGINT) AS n_rows_scanned
       |  FROM stats GROUP BY 1
       |), outrows AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_out FROM tagged
       |  WHERE un BETWEEN $boxLo AND $boxHi AND dn BETWEEN $boxLo AND $boxHi
       |)
       |SELECT layout, n_files, n_files_scanned, n_rows_scanned, n_rows_out
       |FROM pruned, outrows""".stripMargin
}
