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

  /** The approximate tier of [[events]] — the 100 TB shape: exact
    * COUNT(DISTINCT) per column needs the multi-distinct Expand plan
    * (6× row fan-out before the shuffle, 34 s at 100× in SCALE.md);
    * this variant replaces every distinct with an `hll_sketch` UDAF
    * ([[graft.functions.HllSketchAgg]]) in the SAME single `agg(...)`,
    * so the scan emits one constant-size register buffer per column per
    * task — no Expand, no fan-out, map-side partial merge — and the
    * distinct estimates land within HLL's 3σ band (±~20% at b = 8;
    * within_bound proven per-scope in `events_hll`). Min/max/null
    * columns are exact and identical to the exact tier.
    *
    * Hash inputs are engine-portable string forms: longs cast to
    * string, ts via epoch micros, `value` quantized to micro-units
    * BIGINT (a double's direct string form differs between engines in
    * exponent rendering; the micro-grid is the library's established
    * cross-engine quantization, so the profile estimates distincts of
    * the quantized values — stated, not hidden).
    */
  def eventsApprox(spark: SparkSession, dir: String, b: Int = 8): DataFrame = {
    graft.functions.SketchAggFunctions.register(spark)
    val ev = Tables.events(spark, dir)
    val cols = Seq(
      Col("event_id", col("event_id").cast("double"), lit(null).cast("string")),
      Col("ts", unix_micros(col("ts")).cast("double"), lit(null).cast("string")),
      Col("user_id", col("user_id").cast("double"), lit(null).cast("string")),
      Col("event_type", lit(null).cast("double"), col("event_type")),
      Col("value", col("value"), lit(null).cast("string")),
      Col("props", lit(null).cast("double"), col("props")))
    val hashIn: Map[String, Column] = Map(
      "event_id" -> col("event_id").cast("string"),
      "ts" -> unix_micros(col("ts")).cast("string"),
      "user_id" -> col("user_id").cast("string"),
      "event_type" -> col("event_type"),
      "value" -> round(col("value") * lit(1e6)).cast("long").cast("string"),
      "props" -> col("props"))
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c.name).isNull, 1)).as(s"${c.name}__nulls"),
        call_function("hll_sketch", hashIn(c.name), lit(b))
          .as(s"${c.name}__regs"),
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
        col(s"${c.name}__regs").as("regs"),
        col(s"${c.name}__min_num").as("min_num"),
        col(s"${c.name}__max_num").as("max_num"),
        col(s"${c.name}__min_str").as("min_str"),
        col(s"${c.name}__max_str").as("max_str"))
    }: _*)
    // dual-regime estimator over the per-column registers (the same
    // arithmetic as Sketch.hllDistinctUsers, replayed by the oracle)
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val long2_53 = lit(9007199254740992.0) // 2^53 exact in a double
    val unp = wide.select(explode(rows).as("r")).select("r.*")
      .withColumn("s",
        expr("aggregate(regs, 0L, (acc, mj) -> acc + shiftleft(1L, 53 - mj))"))
      .withColumn("v", size(filter(col("regs"), mj => mj === 0)).cast("long"))
    val raw = lit(alpha) * m * m * long2_53 / col("s").cast("double")
    val isLinear = raw <= lit(2.5 * m) && col("v") > 0
    val estD = when(isLinear,
      lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
      .otherwise(raw).cast("decimal(14,4)").cast("double")
    unp.select(col("column"), col("n_rows"), col("n_nulls"),
      estD.as("n_distinct_hll"),
      col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  def eventsApproxSql(b: Int = 8): String = {
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val cols = Seq(
      ("event_id", "CAST(event_id AS DOUBLE)", "NULL",
        "CAST(event_id AS VARCHAR)"),
      ("ts", "CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)", "NULL",
        "CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR)"),
      ("user_id", "CAST(user_id AS DOUBLE)", "NULL",
        "CAST(user_id AS VARCHAR)"),
      ("event_type", "NULL", "event_type", "event_type"),
      ("value", "value", "NULL",
        "CAST(CAST(round(value * 1000000.0) AS BIGINT) AS VARCHAR)"),
      ("props", "NULL", "props", "props"))
    val branches = cols.map { case (name, num, str, hash) =>
      s"""SELECT '$name' AS "column", t.n_rows, s.n_nulls, h.est AS n_distinct_hll,
         |  s.min_num, s.max_num, s.min_str, s.max_str
         |FROM t, (
         |  SELECT CAST(COUNT(*) FILTER ($name IS NULL) AS BIGINT) AS n_nulls,
         |         CAST(MIN($num) AS DOUBLE) AS min_num,
         |         CAST(MAX($num) AS DOUBLE) AS max_num,
         |         CAST(MIN($str) AS VARCHAR) AS min_str,
         |         CAST(MAX($str) AS VARCHAR) AS max_str
         |  FROM events
         |) s, (
         |  WITH hx AS (
         |    SELECT DISTINCT CAST('0x' || substr(md5($hash), 1, 15) AS BIGINT) AS h
         |    FROM events WHERE $hash IS NOT NULL
         |  ), reg AS (
         |    SELECT h % $m AS reg,
         |           MAX(CASE WHEN h // $m > 0 THEN 53 - length(bin(h // $m))
         |                    ELSE 53 END) AS mj
         |    FROM hx GROUP BY 1
         |  ), filled AS (
         |    SELECT i.range AS reg, COALESCE(r.mj, 0) AS mj
         |    FROM range(0, $m) i LEFT JOIN reg r ON r.reg = i.range
         |  ), st AS (
         |    SELECT CAST(SUM(CAST(power(2.0, 53 - mj) AS BIGINT)) AS BIGINT) AS sm,
         |           SUM(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS v
         |    FROM filled
         |  )
         |  SELECT CAST(CAST(CASE WHEN raw <= ${2.5 * m} AND v > 0
         |       THEN $m * ln($m / CAST(v AS DOUBLE)) ELSE raw END
         |       AS DECIMAL(14,4)) AS DOUBLE) AS est
         |  FROM (SELECT v, CAST($alpha AS DOUBLE) * $m * $m * 9007199254740992E0
         |                    / CAST(sm AS DOUBLE) AS raw
         |        FROM st)
         |) h""".stripMargin
    }
    s"""WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM events)
       |${branches.mkString("\n UNION ALL \n")}""".stripMargin
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

  /** Metadata-only table stats — the fourth scan-elimination lever as a
    * USABLE operator, not just a plan assertion: COUNT/MIN/MAX answered
    * from parquet row-group footer statistics by the v2 source
    * (`PushedAggregation`), never touching a data page. The query
    * REQUIRES the pushdown in its own plan, so a Spark upgrade that
    * silently regressed it to a full scan fails loudly instead of
    * burning a 100 TB read. Reads the raw file (no cast/filter above
    * the relation — any would block the pushdown by design).
    */
  def eventsStatsFast(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    val prevPd = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val agg = spark.read.parquet(s"$dir/events.parquet")
        .agg(count(lit(1)).as("n_rows"), min("user_id").as("min_user"),
          max("user_id").as("max_user"))
      require(agg.queryExecution.executedPlan.toString
        .contains("PushedAggregation: [COUNT(*), MIN(user_id), MAX(user_id)]"),
        "footer-stats aggregate was not pushed down — would full-scan at 100 TB")
      // materialize under the pushdown confs before they are restored
      agg.localCheckpoint(eager = true)
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", prevPd)
    }
  }

  val eventsStatsFastSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       MIN(user_id) AS min_user, MAX(user_id) AS max_user
      |FROM events""".stripMargin
}
