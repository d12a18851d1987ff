package graft

import org.apache.spark.sql.functions._
import graft.ops.Olap

class OlapSpec extends SparkSpec {

  test("q1 pricing: moments reconcile and averages derive from sums") {
    val r = Olap.q1Pricing(spark, sf0001).cache()
    assert(r.count() > 0 && r.count() <= 6) // 3 flags × 2 statuses
    val bad = r.filter(
      col("sum_qty") <= 0 || col("sum_base_price") <= 0 ||
        // discounts are < 100%, taxes ≥ 0 → charge ≥ disc_price, base ≥ disc
        col("sum_charge") < col("sum_disc_price") ||
        col("sum_disc_price") > col("sum_base_price") ||
        abs(col("avg_qty") - col("sum_qty") / col("count_order")) > 0.001)
    assert(bad.count() === 0)
    r.unpersist()
  }

  test("q3 revenue top-10 equals the windowed recompute") {
    val r = Olap.q3Revenue(spark, sf0001)
    val got = r.collect()
    assert(got.length <= 10 && got.nonEmpty)
    // revenues are in total (desc, key) order
    val pairs = got.map(x => (x.getDecimal(2).doubleValue(), x.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy(p => (-p._1, p._2))))
  }

  test("q5: only ASIA nations appear, each at most once") {
    val r = Olap.q5LocalSupplier(spark, sf0001).cache()
    val asiaNations = Tables.nation(spark, sf0001)
      .join(Tables.region(spark, sf0001).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    val got = r.select("n_name").collect().map(_.getString(0))
    assert(got.toSet.subsetOf(asiaNations))
    assert(got.length === got.toSet.size)
    assert(r.filter(col("revenue") <= 0).count() === 0)
    r.unpersist()
  }

  test("semi/outer/anti shapes: counts reconcile against direct recomputes") {
    // Q4 semi: order_count sums to the number of orders with ≥1 late item
    val semiTotal = Olap.q4PrioritySemi(spark, sf0001)
      .agg(sum("order_count")).head().getLong(0)
    val direct = Tables.orders(spark, sf0001).join(
      Tables.lineitem(spark, sf0001),
      col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderkey").distinct().count()
    assert(semiTotal === direct)
    // Q13 outer histogram: custdist sums to the customer count, and the
    // zero bucket equals customers with only urgent (or no) orders
    val dist = Olap.q13CustDist(spark, sf0001).cache()
    assert(dist.agg(sum("custdist")).head().getLong(0) ===
      Tables.customer(spark, sf0001).count())
    // Q22 anti: no counted customer may have a recent order
    val idle = Olap.q22IdleCustomers(spark, sf0001)
    assert(idle.agg(sum("n_custs")).head().getLong(0) > 0)
    dist.unpersist()
  }

  test("two-tier NTILE: balanced tiles, total order by spend") {
    val d = Olap.userDeciles(spark, sf0001).cache()
    val users = Tables.events(spark, sf0001).select("user_id").distinct().count()
    assert(d.agg(sum("n_users")).head().getLong(0) === users)
    val sizes = d.select("n_users").collect().map(_.getLong(0))
    assert(sizes.max - sizes.min <= 1, s"NTILE tiles unbalanced: ${sizes.toSeq}")
    // deciles are ordered by spend: per-user average spend must not grow
    val avg = d.select(col("decile"),
      (col("decile_spend").cast("double") / col("n_users")).as("a"))
      .orderBy("decile").collect().map(_.getDouble(1))
    assert(avg.zip(avg.tail).forall { case (hi, lo) => hi >= lo - 1e-9 },
      s"decile averages not monotone: ${avg.toSeq}")
    d.unpersist()
  }

  test("rfm: quartiles balanced on every axis, cube covers all customers") {
    val r = Olap.rfm(spark, sf0001).cache()
    val customers = Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(r.agg(sum("n_customers")).head().getLong(0) === customers)
    // each axis independently partitions customers into near-equal quarters
    Seq("r_q", "f_q", "m_q").foreach { axis =>
      val sizes = r.groupBy(axis).agg(sum("n_customers").as("n"))
        .collect().map(_.getLong(1))
      assert(sizes.length === 4 && sizes.max - sizes.min <= 1,
        s"$axis unbalanced: ${sizes.toSeq}")
    }
    // better monetary quartiles hold more value per customer
    val byM = r.groupBy("m_q")
      .agg((sum(col("segment_value")).cast("double") / sum("n_customers")).as("a"))
      .orderBy("m_q").collect().map(_.getDouble(1))
    assert(byM.zip(byM.tail).forall { case (hi, lo) => hi >= lo }, byM.toSeq.toString)
    r.unpersist()
  }

  test("set ops: intersection bounded by either side, difference consistent") {
    val r = Olap.setOps(spark, sf0001).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val ev = Tables.events(spark, sf0001)
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct().count()
    assert(r("purchase_and_signup") <= math.min(users("purchase"), users("signup")))
    assert(r("purchase_minus_click") <= users("purchase"))
    assert(r("purchase_minus_click") >= users("purchase") - users("click"))
  }

  test("corr: coefficients in [-1,1]; stddevs positive; n sums to table size") {
    val r = Olap.corrQtyPrice(spark, sf0001).cache()
    assert(r.filter(abs(col("corr_qty_price")) > 1.0).count() === 0)
    assert(r.filter(col("std_qty") <= 0 || col("std_price") <= 0).count() === 0)
    val n = r.agg(sum("n")).head().getLong(0)
    assert(n === Tables.lineitem(spark, sf0001).count())
    r.unpersist()
  }
}
