package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Third tranche of decision-support shapes — the TPC-H Q6/Q12/Q14/Q16/
  * Q20 patterns, completing the full 22-skeleton TPC-H catalog together
  * with [[Olap]] (Q1/Q3/Q4/Q5/Q13/Q22) and [[OlapTpch]] (Q2/Q7–Q11/Q15/
  * Q17–Q19/Q21). As with the second tranche, shapes are adapted to the
  * fixture's columns: no partsupp, so the part↔supplier relation is the
  * DISTINCT (l_partkey, l_suppkey) projection of lineitem; no
  * shipmode/receiptdate, so Q12's "late" leg is ship-lag vs the order
  * date and the line dimension is l_linestatus.
  *
  * Same 100 TB plan discipline as the earlier tranches: the fact table
  * is the only at-scale shuffle input, dimension slices go through
  * [[graft.Bcast]] (SF-linear slices unhinted — AQE broadcasts them at
  * runtime while they fit), money/quantity aggregates ride an exact
  * DECIMAL grid (order-free summation, so Spark and the oracle agree
  * bit-for-bit), ratio outputs divide two exact sums in double at the
  * very end, and every output carries a total order.
  */
object OlapTpch3 {

  /** `l_extendedprice * (1 - l_discount)` on the exact DECIMAL grid. */
  private def rev: Column =
    (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      .cast("decimal(28,4)")

  private val revSql: String =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |  AS DECIMAL(28,4))""".stripMargin

  /** TPC-H Q6 shape: the forecast-revenue-change scalar — one tight
    * scan-side filter (date window + discount band + quantity cap), one
    * partial-aggregated SUM, zero joins. The whole query is a single
    * pushed-filter parquet scan feeding a map-side-combined aggregate;
    * at 100 TB it is bounded by scan bandwidth alone. The discount band
    * compares on DECIMAL(4,2) (the fixture's discounts are exact
    * hundredths) so the BETWEEN endpoints are exact in both engines.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_date(lit("1996-01-01")) &&
        col("l_shipdate") < to_date(lit("1997-01-01")) &&
        col("l_discount").cast("decimal(4,2)").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        col("l_discount").cast("decimal(18,2)")).cast("decimal(28,4)")
        .as("revenue"))

  val q6ForecastSql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q12 shape: late lines by line dimension with a CASE split on
    * order priority. The fixture has no shipmode/receiptdate, so "late"
    * is a ship-lag > 60 days vs the order date and the grouping
    * dimension is l_linestatus — the skeleton (fact⋈fact equi join,
    * post-join residual comparing columns from both sides, paired
    * conditional counts) is unchanged. The date-window filter prunes
    * lineitem BEFORE the orderkey shuffle; orders ships only the three
    * columns the residual and CASE need.
    */
  def q12LateLines(spark: SparkSession, dir: String): DataFrame = {
    val highPrio = Seq("1-URGENT", "2-HIGH")
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linestatus", "l_shipdate")
      .filter(col("l_shipdate") >= to_date(lit("1996-01-01")) &&
        col("l_shipdate") < to_date(lit("1997-01-01")))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      // o_orderdate is a TIMESTAMP: add a calendar interval (date_add
      // would truncate to a date, diverging from the oracle's
      // `o_orderdate + INTERVAL 60 DAY` on any non-midnight timestamp)
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin(highPrio: _*), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin(highPrio: _*), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val q12LateLinesSql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q14 shape: promotion share of revenue — a conditional-sum /
    * total-sum ratio per ship year. Both sums accumulate on the exact
    * DECIMAL grid inside one aggregate pass (no second scan for the
    * denominator); the division happens once per output row in double,
    * with the same operand order as the oracle so the IEEE result is
    * identical. part broadcasts (it is the only dimension touched).
    */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), year(col("l_shipdate")).as("ship_year"),
        rev.as("r"))
      .join(Bcast.ifBounded(p, Bcast.Linear), col("l_partkey") === col("p_partkey"))
      .groupBy("ship_year")
      .agg((lit(100.0) *
        sum(when(col("p_type") === "PROMO", col("r"))
          .otherwise(lit(0).cast("decimal(28,4)"))).cast("double") /
        sum(col("r")).cast("double")).as("promo_share"))
      .orderBy("ship_year")
  }

  val q14PromoShareSql: String =
    s"""SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
      |  CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql
      |                         ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
      |       / CAST(SUM($revSql) AS DOUBLE) AS DOUBLE) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q16 shape: supplier count per part descriptor, excluding a
    * blacklisted supplier set (the NOT IN subquery → a broadcast LEFT
    * ANTI join; s_suppkey is non-null so the two are equivalent). The
    * part↔supplier relation is the DISTINCT (l_partkey, l_suppkey)
    * projection of lineitem — one fact-grain shuffle — and the part
    * descriptor filter broadcasts. COUNT(DISTINCT) re-shuffles at the
    * (brand, type, size) grain, which is dimension-sized.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 2000).select("s_suppkey")
    val ps = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(Bcast.ifBounded(bad, Bcast.Linear), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    ps.join(Bcast.ifBounded(p, Bcast.Linear), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16SupplierCntSql: String =
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_type, p_size,
      |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM ps JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1,5,10,15,20,25,30,35,40,45,50)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 2000)
      |GROUP BY 1,2,3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 shape: the nested-aggregate threshold — suppliers whose
    * shipped quantity exceeds half a part's total annual volume
    * ("concentration risk": the fixture has no ps_availqty, so the
    * original's availqty > ½·demand becomes share-of-part-volume > ½ —
    * the same inner-agg → threshold-from-outer-agg → supplier semi
    * skeleton). vol aggregates lineitem ONCE at (part, supplier) grain;
    * part totals come from a whole-partition window over that reduced
    * frame — partitions are per-part supplier lists, suppliers-per-part
    * rows each — so the fact is never rescanned and no self-join is
    * planned (a vol⋈vol.groupBy formulation scanned lineitem 4× —
    * exchange reuse does not dedupe across the join's two legs). The ½
    * threshold is the exact integer compare 2·supp_qty > part_qty on
    * the DECIMAL grid. Output counts dominated parts per supplier so
    * the result discriminates.
    */
  def q20ExcessShare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vol = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_date(lit("1996-01-01")) &&
        col("l_shipdate") < to_date(lit("1997-01-01")))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("supp_qty"))
      .withColumn("part_qty", sum("supp_qty")
        .over(Window.partitionBy("l_partkey")).cast("decimal(28,2)"))
    val p = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small"))
      .select("p_partkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    vol
      .join(Bcast.ifBounded(p, Bcast.Linear), col("l_partkey") === col("p_partkey"))
      .filter(col("supp_qty") * 2 > col("part_qty"))
      .join(Bcast.ifBounded(s, Bcast.Linear), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_dominated"))
      .orderBy("s_suppkey")
  }

  val q20ExcessShareSql: String =
    """WITH vol AS (
      |  SELECT l_partkey, l_suppkey,
      |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
      |  FROM lineitem
      |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |  GROUP BY 1,2
      |), tot AS (
      |  SELECT l_partkey, CAST(SUM(supp_qty) AS DECIMAL(28,2)) AS part_qty
      |  FROM vol GROUP BY 1
      |)
      |SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS n_dominated
      |FROM vol JOIN tot USING (l_partkey)
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |WHERE p_name LIKE 'small%' AND supp_qty * 2 > part_qty
      |GROUP BY 1,2 ORDER BY 1""".stripMargin
}
