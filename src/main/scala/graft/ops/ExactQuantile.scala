package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** EXACT order statistics without a global sort — the distributed-
  * selection alternative to `percentile()` (which buffers each group's
  * values) and to sorting (which shuffles every row into a total
  * order). Three bounded passes:
  *
  *   1. per-group `n`/`min`/`max` (map-side combined scalars);
  *   2. a fixed-width histogram — `bins` counters per group — whose
  *      cumulative counts locate the BIN containing the target rank;
  *   3. a per-distinct-value count restricted to that one bin, whose
  *      cumulative count selects the exact element.
  *
  * No stage ever materializes more than `groups × bins` (pass 2) or
  * the median bin's distinct values (pass 3) — pathological value
  * concentration collapses into the per-value counts rather than a
  * single sorted partition, so the worst case is ONE row per group,
  * not n. At 100 TB this is 3 scan-bound passes vs an O(n log n)
  * total-order shuffle; the histogram granularity only affects how
  * much pass 3 touches, never correctness.
  *
  * Convention pinned cross-engine: the LOWER median, the value at
  * 1-based rank `(n+1) DIV 2` of the non-null values ordered
  * ascending — the oracle states it as exactly that window expression.
  */
object ExactQuantile {

  def exactMedian(spark: SparkSession, dir: String,
                  bins: Int = 1024): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("event_type", "value").filter(col("value").isNotNull)

    // pass 1: group frame — counts and value range
    val bounds = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
      .withColumn("target", expr("(n + 1) DIV 2"))

    def binOf = when(col("hi") === col("lo"), lit(0)).otherwise(
      least(floor((col("value") - col("lo")) /
        ((col("hi") - col("lo")) / bins)).cast("int"), lit(bins - 1)))

    // pass 2: histogram → the bin holding the target rank, and the
    // cumulative count strictly before it (groups × bins rows only)
    val hist = ev.join(Bcast.ifBounded(bounds, Bcast.Domain), "event_type")
      .groupBy(col("event_type"), binOf.as("bin"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.partitionBy("event_type").orderBy("bin")))
    val medianBin = cum
      .join(Bcast.ifBounded(bounds.select("event_type", "target"), Bcast.Domain), "event_type")
      .filter(col("cum") >= col("target"))
      .groupBy("event_type")
      .agg(min(struct(col("bin"), (col("cum") - col("c")).as("before")))
        .as("mb"))
      .select(col("event_type"), col("mb.bin").as("median_bin"),
        col("mb.before").as("before"))

    // pass 3: exact selection inside the one bin — per-DISTINCT-value
    // counts, so concentration collapses instead of piling into a sort
    val inBin = ev.join(Bcast.ifBounded(bounds, Bcast.Domain), "event_type")
      .withColumn("bin", binOf)
      .join(Bcast.ifBounded(medianBin, Bcast.Domain), "event_type")
      .filter(col("bin") === col("median_bin"))
    inBin.groupBy("event_type", "n", "target", "before", "value")
      .agg(count(lit(1)).as("vc"))
      .withColumn("vcum", col("before") +
        sum("vc").over(Window.partitionBy("event_type").orderBy("value")))
      .filter(col("vcum") >= col("target"))
      .groupBy("event_type", "n")
      .agg(min("value").as("median"))
      .orderBy("event_type")
  }

  val exactMedianSql: String =
    """SELECT event_type, n, value AS median FROM (
      |  SELECT event_type, value,
      |         row_number() OVER (PARTITION BY event_type ORDER BY value) AS r,
      |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM events WHERE value IS NOT NULL) t
      |WHERE r = (n + 1) // 2 ORDER BY 1""".stripMargin

  /** All requested percentiles in the SAME three passes: one histogram
    * locates every target's bin, and pass 3 touches only the union of
    * those bins (each event row joins at most `pcts.size` of them).
    * Rank convention matches [[Sketch.quantileSketch]]'s targets —
    * `⌈pct·n/100⌉` — so this is the exact tier of the same family: the
    * sketch answers with bounded rank error from mergeable state, this
    * answers exactly in one extra bounded pass.
    */
  def exactQuantiles(spark: SparkSession, dir: String,
                     pcts: Seq[Int] = Seq(50, 95, 99),
                     bins: Int = 1024): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("event_type", "value").filter(col("value").isNotNull)

    val bounds = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
    val targets = bounds
      .select(col("event_type"), col("n"), col("lo"), col("hi"),
        explode(array(pcts.map(lit): _*)).as("pct"))
      .withColumn("target", expr("(n * pct + 99) DIV 100"))

    def binOf = when(col("hi") === col("lo"), lit(0)).otherwise(
      least(floor((col("value") - col("lo")) /
        ((col("hi") - col("lo")) / bins)).cast("int"), lit(bins - 1)))

    val hist = ev.join(Bcast.ifBounded(bounds, Bcast.Domain), "event_type")
      .groupBy(col("event_type"), binOf.as("bin"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.partitionBy("event_type").orderBy("bin")))
    val targetBins = cum
      .join(Bcast.ifBounded(targets.select("event_type", "pct", "target"), Bcast.Domain),
        "event_type")
      .filter(col("cum") >= col("target"))
      .groupBy("event_type", "pct", "target")
      .agg(min(struct(col("bin"), (col("cum") - col("c")).as("before")))
        .as("tb"))
      .select(col("event_type"), col("pct"), col("target"),
        col("tb.bin").as("target_bin"), col("tb.before").as("before"))

    val inBins = ev.join(Bcast.ifBounded(bounds, Bcast.Domain), "event_type")
      .withColumn("bin", binOf)
      .join(Bcast.ifBounded(targetBins, Bcast.Domain), Seq("event_type"))
      .filter(col("bin") === col("target_bin"))
    inBins.groupBy("event_type", "pct", "target", "before", "value")
      .agg(count(lit(1)).as("vc"))
      .withColumn("vcum", col("before") + sum("vc")
        .over(Window.partitionBy("event_type", "pct").orderBy("value")))
      .filter(col("vcum") >= col("target"))
      .groupBy("event_type", "pct")
      .agg(min("value").as("q"))
      .join(Bcast.ifBounded(bounds.select("event_type", "n"), Bcast.Domain), "event_type")
      .select("event_type", "pct", "n", "q")
      .orderBy("event_type", "pct")
  }

  val exactQuantilesSql: String =
    """SELECT event_type, pct, n, value AS q FROM (
      |  SELECT event_type, value, p.pct,
      |         row_number() OVER (PARTITION BY event_type, p.pct
      |                            ORDER BY value) AS r,
      |         CAST(count(*) OVER (PARTITION BY event_type, p.pct) AS BIGINT) AS n
      |  FROM events CROSS JOIN (VALUES (50), (95), (99)) p(pct)
      |  WHERE value IS NOT NULL) t
      |WHERE r = (n * pct + 99) // 100 ORDER BY 1, 2""".stripMargin
}
