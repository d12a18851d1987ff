package graft

import org.apache.spark.sql.functions._
import graft.ops.OlapTpch3

class OlapTpch3Spec extends SparkSpec {

  test("q6: scalar equals the filtered first-principles recompute, no joins") {
    val r = OlapTpch3.q6Forecast(spark, sf0001).cache()
    assert(r.count() === 1)
    val want = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= to_date(lit("1996-01-01")) &&
        col("l_shipdate") < to_date(lit("1997-01-01")) &&
        col("l_discount").cast("decimal(4,2)").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .select(sum(col("l_extendedprice").cast("decimal(18,2)") *
        col("l_discount").cast("decimal(18,2)")))
      .head().getDecimal(0)
    assert(r.head().getDecimal(0).compareTo(want) === 0)
    // single-table scalar: the plan must contain no join of any kind
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    r.unpersist()
  }

  test("q12: high+low counts equal the joined-row totals per status") {
    val r = OlapTpch3.q12LateLines(spark, sf0001).cache()
    assert(r.count() > 0)
    val total = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= to_date(lit("1996-01-01")) &&
        col("l_shipdate") < to_date(lit("1997-01-01")))
      .join(Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > date_add(col("o_orderdate"), 60))
      .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.collect().foreach { row =>
      assert(row.getLong(1) + row.getLong(2) === total(row.getString(0)))
    }
    r.unpersist()
  }

  test("q14: promo share within [0,100]; year revenue split reconciles") {
    val r = OlapTpch3.q14PromoShare(spark, sf0001).cache()
    assert(r.count() > 0)
    assert(r.filter(col("promo_share") < 0 || col("promo_share") > 100)
      .count() === 0)
    // PROMO parts exist in the fixture, so no year should be 0 or 100
    assert(r.filter(col("promo_share") === 0.0 || col("promo_share") === 100.0)
      .count() === 0)
    r.unpersist()
  }

  test("q16: excluded suppliers never counted; counts bounded by supplier pool") {
    val r = OlapTpch3.q16SupplierCnt(spark, sf0001).cache()
    assert(r.count() > 0)
    val good = Tables.supplier(spark, sf0001)
      .filter(col("s_acctbal") >= 2000).count()
    assert(r.filter(col("supplier_cnt") > good).count() === 0)
    // every output descriptor respects the part-side filters
    val bad = r.filter(col("p_brand") === "Brand#1" ||
      col("p_type") === "PROMO" ||
      !col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50))
    assert(bad.count() === 0)
    r.unpersist()
  }

  test("q20: every dominated (part, supplier) really holds >half the volume") {
    val vol = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= to_date(lit("1996-01-01")) &&
        col("l_shipdate") < to_date(lit("1997-01-01")))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"))
    val smallParts = Tables.part(spark, sf0001)
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val expected = vol
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .join(vol.groupBy(col("l_partkey").as("pk"))
        .agg(sum("sq").as("tq")), col("l_partkey") === col("pk"))
      .filter(col("sq") * 2 > col("tq"))
      .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val q = graft.ops.OlapTpch3.q20ExcessShare(spark, sf0001)
    val r = q.collect()
    assert(r.nonEmpty)
    assert(r.map(row => row.getLong(0) -> row.getAs[Long]("n_dominated")).toMap
      === expected)
    // one fact scan: the part-total window rides the (part, supplier)
    // rollup, never a vol x vol self-join that would rescan lineitem
    val finalPlan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.split("\n")
      .count(l => l.contains("FileScan parquet") && l.contains("lineitem")) === 1,
      s"q20 must scan lineitem exactly once:\n$finalPlan")
  }
}
