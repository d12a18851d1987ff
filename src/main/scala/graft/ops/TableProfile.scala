package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ANALYZE-style per-column table profiling — the statistics pass every
  * engine runs before trusting a new delivery or feeding the optimizer:
  * for each column, null count, exact distinct count, and typed min/max
  * (numeric-and-temporal columns on a numeric lane — timestamps as epoch
  * micros — strings on a lexicographic lane). Complements the
  * dataset-level [[graft.Catalog]] report (row counts + declared-schema
  * drift) with column-level content statistics.
  *
  * One corpus scan: all per-column aggregates run in a single
  * `agg(...)`; the multiple exact COUNT(DISTINCT)s expand map-side (one
  * Expand node, one shuffle — the standard multi-distinct plan), and the
  * wide one-row result is unpivoted to column-grain rows driver-free
  * with a literal struct array. Min/max/nulls are algebraic, so every
  * split contributes constant-size state.
  *
  * Determinism: no arithmetic is performed on the values — min/max pass
  * through bit-identical, counts are integers; the only computed value
  * (epoch micros) is exact integer conversion in both engines.
  */
object TableProfile {

  private case class Col(name: String, numExpr: Column, strExpr: Column)

  /** Column-grain profile of the events table. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cols = Seq(
      Col("event_id", col("event_id").cast("double"), lit(null).cast("string")),
      Col("ts", unix_micros(col("ts")).cast("double"), lit(null).cast("string")),
      Col("user_id", col("user_id").cast("double"), lit(null).cast("string")),
      Col("event_type", lit(null).cast("double"), col("event_type")),
      Col("value", col("value"), lit(null).cast("string")),
      Col("props", lit(null).cast("double"), col("props")))
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c.name).isNull, 1)).as(s"${c.name}__nulls"),
        // distinct on the RAW column: cross-engine equality of stored
        // values, no string rendering anywhere
        countDistinct(col(c.name)).as(s"${c.name}__distinct"),
        min(c.numExpr).as(s"${c.name}__min_num"),
        max(c.numExpr).as(s"${c.name}__max_num"),
        min(c.strExpr).as(s"${c.name}__min_str"),
        max(c.strExpr).as(s"${c.name}__max_str"))
    }
    val wide = ev.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = array(cols.map { c =>
      struct(
        lit(c.name).as("column"),
        col("n_rows").as("n_rows"),
        col(s"${c.name}__nulls").as("n_nulls"),
        col(s"${c.name}__distinct").as("n_distinct"),
        col(s"${c.name}__min_num").as("min_num"),
        col(s"${c.name}__max_num").as("max_num"),
        col(s"${c.name}__min_str").as("min_str"),
        col(s"${c.name}__max_str").as("max_str"))
    }: _*)
    wide.select(explode(rows).as("r")).select("r.*")
  }

  val eventsSql: String = {
    val cols = Seq(
      ("event_id", "CAST(event_id AS DOUBLE)", "NULL"),
      ("ts", "CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)", "NULL"),
      ("user_id", "CAST(user_id AS DOUBLE)", "NULL"),
      ("event_type", "NULL", "event_type"),
      ("value", "value", "NULL"),
      ("props", "NULL", "props"))
    val branches = cols.map { case (name, num, str) =>
      s"""SELECT '$name' AS "column", n_rows,
         |  CAST(COUNT(*) FILTER ($name IS NULL) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $name) AS BIGINT) AS n_distinct,
         |  CAST(MIN($num) AS DOUBLE) AS min_num, CAST(MAX($num) AS DOUBLE) AS max_num,
         |  CAST(MIN($str) AS VARCHAR) AS min_str, CAST(MAX($str) AS VARCHAR) AS max_str
         |FROM events, t GROUP BY n_rows""".stripMargin
    }
    s"""WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM events)
       |${branches.mkString("\n UNION ALL \n")}""".stripMargin
  }
}
