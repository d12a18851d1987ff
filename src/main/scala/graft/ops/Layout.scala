package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

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

  /** Per-(layout, file) footprint report: row count and the min/max span
    * of both predicate columns inside each file (spans in RAW key units).
    */
  def zorderReport(spark: SparkSession, dir: String, files: Int = 16): DataFrame = {
    // integer `div`, not float division: exact at any epoch magnitude
    val day = expr("unix_micros(ts) div 86400000000")
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("u"), day.as("d"))
    val bounds = ev.agg(min("u").as("umin"), max("u").as("umax"),
      min("d").as("dmin"), max("d").as("dmax"))
    val grid = 1L << bits
    val withB = ev.crossJoin(broadcast(bounds))
      .select(col("u"), col("d"),
        expr(s"(u - umin) * $grid div (umax - umin + 1)").as("un"),
        expr(s"(d - dmin) * $grid div (dmax - dmin + 1)").as("dn"))
    val z = zval(col("un"), col("dn"))
    val zmax = 1L << (2 * bits)
    val tagged = withB.select(col("u"), col("d"),
      (z * files / zmax).cast("int").as("zfile"),
      (col("un") * files / grid).cast("int").as("ufile"))
    // one scan for both layouts: tag-explode each row into its two
    // (layout, file) memberships, then a single grouped aggregate
    tagged.select(col("u"), col("d"), explode(array(
        struct(lit("user_sort").as("layout"), col("ufile").as("file_id")),
        struct(lit("zorder").as("layout"), col("zfile").as("file_id")))).as("lf"))
      .groupBy(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        (max("u") - min("u")).as("user_span"),
        (max("d") - min("d")).as("day_span"))
  }

  def zorderReportSql(files: Int = 16): String = {
    val grid = 1L << bits
    val zterms = (0 until bits)
      .map(i => s"((un // ${1L << i}) % 2) * ${1L << (2 * i)} + ((dn // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
      .mkString(" + ")
    s"""WITH ev AS (
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
       |  SELECT u, d,
       |         CAST(($zterms) * $files // ${1L << (2 * bits)} AS INT) AS zfile,
       |         CAST(un * $files // $grid AS INT) AS ufile
       |  FROM nrm
       |)
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
  }
}
