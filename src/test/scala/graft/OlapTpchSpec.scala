package graft

import org.apache.spark.sql.functions._
import graft.ops.OlapTpch

class OlapTpchSpec extends SparkSpec {

  test("q7: only the two nation pairs appear, revenue positive") {
    val r = OlapTpch.q7VolumeShipping(spark, sf0001).cache()
    val pairs = r.select("supp_nation", "cust_nation").distinct()
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))))
    assert(r.filter(col("revenue") <= 0).count() === 0)
    // fact joins stay hash joins; every dimension leg broadcasts
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    r.unpersist()
  }

  test("q8: market share is nation_volume / total_volume, within [0,1]") {
    val r = OlapTpch.q8MarketShare(spark, sf0001).cache()
    assert(r.count() > 0)
    val bad = r.filter(col("mkt_share") < 0 || col("mkt_share") > 1 ||
      col("nation_volume") > col("total_volume") ||
      abs(col("mkt_share").cast("double") -
        col("nation_volume").cast("double") / col("total_volume").cast("double"))
        > lit(1e-6))
    assert(bad.count() === 0)
    r.unpersist()
  }

  test("q9: per-(nation, year) profit sums to the ungrouped total") {
    val r = OlapTpch.q9ProductProfit(spark, sf0001).cache()
    assert(r.count() > 0)
    val total = r.agg(sum(col("sum_profit").cast("double"))).head().getDouble(0)
    val p = Tables.part(spark, sf0001).filter(col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_retailprice"))
    val direct = Tables.lineitem(spark, sf0001)
      .join(p, col("l_partkey") === col("p_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("p_retailprice") * col("l_quantity"))).head().getDouble(0)
    assert(math.abs(total - direct) < math.max(1.0, math.abs(direct) * 1e-6))
    r.unpersist()
  }

  test("q10: top-20 in total (revenue desc, custkey) order, returns only") {
    val got = OlapTpch.q10ReturnedTop(spark, sf0001).collect()
    assert(got.nonEmpty && got.length <= 20)
    val pairs = got.map(x => (x.getDecimal(4).doubleValue(), x.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy(p => (-p._1, p._2))))
  }

  test("q11: exactly the parts above the global-total fraction, sorted") {
    val r = OlapTpch.q11PartValue(spark, sf0001).cache()
    val vals = r.collect().map(x => (x.getLong(0), x.getDecimal(1).doubleValue()))
    assert(vals.nonEmpty)
    assert(vals.map(_._2).sameElements(vals.map(_._2).sorted(Ordering[Double].reverse)))
    // recompute the threshold directly: every kept value exceeds it and
    // the count matches a first-principles filter
    val perPart = Tables.lineitem(spark, sf0001)
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("v"))
      .cache()
    val thr = perPart.agg(sum("v")).head().getDouble(0) * 0.0007
    val expect = perPart.filter(col("v") > thr).count()
    assert(math.abs(vals.length - expect) <= 1) // float-vs-decimal edge at most
    assert(vals.forall(_._2 > thr * 0.999))
    perPart.unpersist(); r.unpersist()
  }

  test("q15: every returned supplier has exactly the max revenue") {
    val r = OlapTpch.q15TopSupplier(spark, sf0001).cache()
    assert(r.count() >= 1)
    assert(r.select("total_rev").distinct().count() === 1)
    r.unpersist()
  }

  test("q17: small-quantity filter is strictly below 20% of the part average") {
    val row = OlapTpch.q17SmallQty(spark, sf0001).head()
    assert(row.getLong(0) > 0)
    assert(math.abs(row.getDecimal(2).doubleValue() -
      row.getDecimal(1).doubleValue() / 7.0) < 0.01)
  }

  test("q18: every order in the report really exceeds 300 total quantity") {
    val r = OlapTpch.q18BigOrders(spark, sf0001)
    val keys = r.select("o_orderkey").collect().map(_.getLong(0)).toSet
    if (keys.nonEmpty) {
      val direct = Tables.lineitem(spark, sf0001)
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
        .filter(col("q") > 300)
        .select("l_orderkey").collect().map(_.getLong(0)).toSet
      assert(keys.subsetOf(direct))
    }
  }

  test("q19: DNF filter equals the union-of-three-legs recompute") {
    val one = OlapTpch.q19Disjunctive(spark, sf0001).head()
    val l = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
    def leg(b: String, s1: Int, s2: Int, q1: Int, q2: Int) =
      l.filter(col("p_brand") === b && col("p_size").between(s1, s2) &&
        col("l_quantity").between(q1, q2))
    val n = leg("Brand#1", 1, 15, 1, 11)
      .unionAll(leg("Brand#2", 10, 30, 10, 20))
      .unionAll(leg("Brand#3", 20, 50, 20, 30)).count()
    assert(one.getLong(0) === n)
  }

  test("grouping sets: three levels reconcile (detail → flag → grand)") {
    val r = OlapTpch.groupingSets(spark, sf0001).cache()
    val grand = r.filter(col("g_flag") === 1 && col("g_status") === 1)
    assert(grand.count() === 1)
    val detailN = r.filter(col("g_flag") === 0 && col("g_status") === 0)
      .agg(sum("n_items")).head().getLong(0)
    val flagN = r.filter(col("g_flag") === 0 && col("g_status") === 1)
      .agg(sum("n_items")).head().getLong(0)
    assert(detailN === flagN)
    assert(grand.head().getAs[Long]("n_items") === detailN)
    r.unpersist()
  }

  test("q21: sole-blame semantics verified against a first-principles recompute") {
    val r = graft.ops.OlapTpch.q21ProblemSuppliers(spark, sf0001).cache()
    assert(r.count() > 0)
    // recompute via per-order aggregates: orders with >1 supplier but
    // exactly 1 returning supplier blame that supplier
    val perOrder = Tables.lineitem(spark, sf0001)
      .groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_ret"),
        max(when(col("l_returnflag") === "R", col("l_suppkey"))).as("blame"))
      .filter(col("n_supp") > 1 && col("n_ret") === 1)
      .groupBy(col("blame").as("suppkey"))
      .agg(count(lit(1)).as("n"))
    val want = perOrder.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r.collect().foreach { row =>
      assert(want.get(row.getLong(0)).contains(row.getAs[Long]("n_orders")),
        s"supplier ${row.getLong(0)} count mismatch")
    }
    r.unpersist()
  }

  test("hierarchy rollup: root subtree covers every part exactly once") {
    val r = graft.ops.OlapTpch.partHierarchy(spark, sf0001).cache()
    // partkeys start at 0 and parent(k)=k DIV 2, so the forest has two
    // roots: 0 (a fixed point) and 1 (everything else halves down to it)
    val nParts = Tables.part(spark, sf0001)
      .filter(col("p_partkey") >= 1).count()
    val root = r.filter(col("ancestor") === 1)
    assert(root.count() === 1)
    assert(root.head().getAs[Long]("subtree_parts") === nParts)
    // top-20 is in total (value desc, ancestor) order
    val got = r.collect().map(x => (x.getDecimal(2).doubleValue(), x.getLong(0)))
    assert(got.sameElements(got.sortBy(p => (-p._1, p._2))))
    r.unpersist()
  }

  test("unpivot: 3 measures x flags, totals equal the wide aggregate") {
    val long = graft.ops.OlapTpch.unpivotMeasures(spark, sf0001).cache()
    val flags = Tables.lineitem(spark, sf0001)
      .select("l_returnflag").distinct().count()
    assert(long.count() === flags * 3)
    val qtyTotal = long.filter(col("measure") === "sum_qty")
      .agg(sum(col("total").cast("double"))).head().getDouble(0)
    val direct = Tables.lineitem(spark, sf0001)
      .agg(sum("l_quantity")).head().getDouble(0)
    assert(math.abs(qtyTotal - direct) < 1e-6)
    long.unpersist()
  }

  test("q2: one row per part, the min-(bal, suppkey) shipper, via struct min") {
    val r = OlapTpch.q2MinBalSupplier(spark, sf0001).cache()
    assert(r.count() > 0)
    assert(r.select("p_partkey").distinct().count() === r.count())
    // spot-check one part against a direct recompute
    val row = r.head()
    val part = row.getLong(0)
    val direct = Tables.lineitem(spark, sf0001)
      .filter(col("l_partkey") === part).select("l_suppkey").distinct()
      .join(Tables.supplier(spark, sf0001), col("l_suppkey") === col("s_suppkey"))
      .orderBy(col("s_acctbal"), col("s_suppkey")).head()
    assert(row.getLong(1) === direct.getAs[Long]("s_suppkey"))
    r.unpersist()
  }
}
