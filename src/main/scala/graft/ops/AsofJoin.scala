package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (temporal) join — the classic operator Spark's built-in join
  * surface lacks: for each left row, attach the latest right row with the
  * same key and `right.ts <= left.ts`.
  *
  * A naive formulation is a range join (`l.user = r.user AND r.ts <= l.ts`
  * + a per-row max), which Spark plans as an exploding non-equi join. The
  * scalable shape used here is union + carry-forward window:
  *
  *   1. tag both inputs and union them (narrow, no shuffle);
  *   2. ONE shuffle partitioning by key, sort by (ts, side, id) within
  *      partitions — right rows sort before left rows at equal ts, so a
  *      right row at exactly the left timestamp is visible (ASOF `>=`);
  *   3. `last(right_payload, ignoreNulls)` over rows-unbounded-preceding
  *      carries the newest right payload forward to each left row.
  *
  * Cost at 100 TB: exactly one shuffle + sort of `|L| + |R|` rows, the
  * same as a single sort-merge join — no pair explosion, no driver state.
  * The oracle is DuckDB's native `ASOF LEFT JOIN`, so this checks our
  * composition against an engine-native implementation of the operator.
  */
object AsofJoin {

  /** Generic as-of join. `payload` = right-side columns to carry (renamed
    * by `prefix`); both frames must have `key` and `ts` columns and a
    * unique `id` column for the deterministic equal-ts tiebreak.
    */
  def asof(left: DataFrame, right: DataFrame,
           key: String, ts: String, id: String,
           payload: Seq[String], prefix: String): DataFrame = {
    val sideTag = col("_side")
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val u = l.unionByName(r)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), sideTag, col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(
      when(sideTag === 0,
        struct((ts +: id +: payload.filterNot(c => c == ts || c == id))
          .map(col).toIndexedSeq: _*)),
      ignoreNulls = true).over(w)
    val leftCols = left.columns.map(col).toIndexedSeq
    val carriedCols = (ts +: id +: payload.filterNot(c => c == ts || c == id))
      .map(c => col(s"_c.$c").as(s"$prefix$c"))
    u.withColumn("_c", carried)
      .filter(sideTag === 1)
      .select(leftCols ++ carriedCols: _*)
  }

  /** Registered instance: attribute each purchase to the user's latest
    * click at or before the purchase (the standard attribution query).
    */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val typed = Tables.events(spark, dir)
    val p = typed.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val c = typed.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    asof(p, c, key = "user_id", ts = "ts", id = "event_id",
      payload = Seq("value"), prefix = "click_")
  }

  // ---------- DuckDB oracle: the engine-native ASOF JOIN ----------

  val purchaseAttributionSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT event_id AS click_event_id, user_id, ts AS click_ts,
      |         value AS click_value
      |  FROM events WHERE event_type = 'click'
      |)
      |SELECT p.event_id, p.user_id, p.ts, p.value,
      |       c.click_ts, c.click_event_id, c.click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.click_ts""".stripMargin
}
