package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Classic OLAP workload shapes over the star tables — the TPC-H Q1 /
  * Q3 / Q5 patterns (pricing summary, shipping-priority revenue top-k,
  * local-supplier volume) plus grouped correlation statistics. These
  * prove the engine handles the standard decision-support join/agg
  * shapes a reference user would bring along, with the plans one would
  * want at 100 TB: dimension sides broadcast, fact tables shuffled at
  * most once, every money aggregate on an exact DECIMAL grid so both
  * engines sum order-independently.
  */
object Olap {

  /** TPC-H Q1 shape: pricing summary report. One map-side-combined
    * aggregate over the pruned lineitem scan; every sum accumulates in
    * DECIMAL (exact, order-free), averages derived from sums at the
    * edge.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val qty = col("l_quantity").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    val tax = col("l_tax").cast("decimal(18,2)")
    l.groupBy("l_returnflag", "l_linestatus").agg(
      sum(qty).as("sum_qty"),
      sum(price).as("sum_base_price"),
      sum((price * (lit(1).cast("decimal(18,2)") - disc)).cast("decimal(28,4)"))
        .as("sum_disc_price"),
      sum(((price * (lit(1).cast("decimal(18,2)") - disc)).cast("decimal(28,4)") *
        (lit(1).cast("decimal(18,2)") + tax)).cast("decimal(28,6)"))
        .as("sum_charge"),
      count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty").cast("decimal(28,2)").as("sum_qty"),
        col("sum_base_price").cast("decimal(28,2)").as("sum_base_price"),
        col("sum_disc_price").cast("decimal(28,4)").as("sum_disc_price"),
        col("sum_charge").cast("decimal(28,6)").as("sum_charge"),
        (col("sum_qty").cast("double") / col("count_order").cast("double"))
          .cast("decimal(18,6)").as("avg_qty"),
        col("count_order"))
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |    AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |        AS DECIMAL(28,4))
      |      * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))
      |    AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS avg_qty,
      |  CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
      |GROUP BY 1, 2""".stripMargin

  /** TPC-H Q3 shape: top-10 unshipped orders by revenue for one market
    * segment. Customer (filtered, dimension-sized) broadcasts into
    * orders; the lineitem join shuffles on the order key once; revenue
    * sums in DECIMAL; the top-10 is a total order (revenue desc, then
    * order key) so ties cannot flap.
    */
  def q3Revenue(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(28,4)").as("rev"))
    o.join(Bcast.ifBounded(c, Bcast.Linear), col("o_custkey") === col("c_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum("rev").cast("decimal(28,4)").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3RevenueSql: String =
    """SELECT o_orderkey, o_orderdate,
      |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |         AS DECIMAL(28,4))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2
      |ORDER BY SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |  AS DECIMAL(28,4))) DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: revenue by nation where customer and supplier are
    * in the same nation, one region, one order-date year. All four
    * dimension tables broadcast; the orders⋈lineitem fact join is the
    * single at-scale shuffle; the same-nation predicate rides the
    * supplier broadcast join as an equi-key.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val nr = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(spark, dir)
      .join(Bcast.ifBounded(nr, Bcast.Nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_suppkey"),
      (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,4)").as("rev"))
    o.join(Bcast.ifBounded(c, Bcast.Linear), col("o_custkey") === col("c_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(Bcast.ifBounded(s, Bcast.Linear), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum("rev").cast("decimal(28,4)").as("revenue"))
  }

  val q5LocalSupplierSql: String =
    """SELECT n_name,
      |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |         AS DECIMAL(28,4))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  /** TPC-H Q4 shape: order-priority checking via an EXISTS — a LEFT SEMI
    * join from orders to late-shipped lineitems (equi on the order key
    * with the lateness inequality as residual), then a priority rollup.
    * The semi join never duplicates orders however many lineitems match
    * and carries no lineitem payload through the shuffle.
    */
  def q4PrioritySemi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
      col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  val q4PrioritySemiSql: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1""".stripMargin

  /** TPC-H Q13 shape: customer order-count distribution via a LEFT OUTER
    * join (zero-order customers must survive with count 0) and a
    * histogram over the per-customer counts. Orders filtered to
    * non-urgent inside the join. Two aggregates: customer grain, then
    * the count-of-counts — the second input is customer-cardinality.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val q13CustDistSql: String =
    """WITH per_cust AS (
      |  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c
      |  LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY 1
      |)
      |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM per_cust GROUP BY 1""".stripMargin

  /** TPC-H Q22 shape: well-funded customers gone quiet — a one-row
    * scalar average broadcast as the balance threshold, then a LEFT
    * ANTI join against the final year's orders (the fixture gives every
    * customer SOME order, so the recency cutoff is what makes the
    * anti-join discriminate), rolled up by market segment with DECIMAL
    * balance sums.
    */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
    val avgBal = c.filter(col("bal") > 0)
      .agg((sum(col("bal")).cast("double") / count(lit(1)).cast("double"))
        .as("avg_bal"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-08-01").cast("timestamp"))
      .select("o_custkey")
    c.crossJoin(Bcast.ifBounded(avgBal, Bcast.OneRow))
      .filter(col("bal").cast("double") > col("avg_bal"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_custs"),
        sum(col("bal")).cast("decimal(28,2)").as("total_bal"))
  }

  val q22IdleCustomersSql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer
      |), t AS (
      |  SELECT CAST(SUM(bal) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_bal
      |  FROM c WHERE bal > 0
      |)
      |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_custs,
      |       CAST(SUM(bal) AS DOUBLE) AS total_bal
      |FROM c, t
      |WHERE CAST(bal AS DOUBLE) > t.avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '2000-08-01 00:00:00')
      |GROUP BY 1""".stripMargin

  /** Spend-decile report: NTILE(10) over per-user total spend, then
    * per-decile volume/revenue shares — the global-ranking surface the
    * per-key top-k operators don't exercise. A bare
    * `Window.orderBy(...)` NTILE collapses to ONE partition (fatal at
    * billions of users), so the global rank is built with the two-tier
    * pattern ([[Pack]]'s prefix sum): range-repartition on the sort key,
    * per-partition `row_number`, partition-count offsets (a ≤
    * #partitions-row frame) broadcast back, then NTILE's exact tile
    * arithmetic (`n/k` base, first `n mod k` tiles one larger) applied
    * as integer expressions. Ties broken by user_id → a total order,
    * and the tile rule matches both engines' NTILE definition exactly.
    */
  def userDeciles(spark: SparkSession, dir: String, tiles: Int = 10): DataFrame = {
    val spend = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("spend"))
    globalNtile(spend, Seq(col("spend").desc, col("user_id")), tiles, "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"),
        sum("n_events").as("n_events"),
        sum(col("spend")).cast("decimal(28,2)").as("decile_spend"))
  }

  /** Distributed NTILE over an arbitrary total order — the two-tier
    * ranking shared by [[userDeciles]] and [[rfm]]: range repartition on
    * the sort key, per-partition `row_number`, partition-count prefix
    * offsets broadcast back, then NTILE's exact tile arithmetic as
    * integer expressions. The order must be total (add a key tiebreak)
    * or tile assignment is undefined.
    */
  private def globalNtile(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                          tiles: Int, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val local = df
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn",
        row_number().over(Window.partitionBy("__pid").orderBy(order: _*)))
    // tier 2: partition row counts → exclusive prefix offsets (the frame
    // is ≤ shuffle-partition-count rows — bounded by config, not data)
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(
        sum("__cnt").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val totals = offsets.agg(sum("__cnt").as("__n_total"))
    val ranked = local
      .join(Bcast.ifBounded(offsets.select("__pid", "__offset"), Bcast.Partitions), "__pid")
      .crossJoin(Bcast.ifBounded(totals, Bcast.OneRow))
      .withColumn("__rank", col("__lrn") + col("__offset"))
      // integer DIV throughout — `/` on longs is double division in Spark
      .withColumn("__base", expr(s"__n_total DIV $tiles"))
      .withColumn("__rem", col("__n_total") % tiles)
      .withColumn("__cut", col("__rem") * (col("__base") + 1))
    val tile = when(col("__rank") <= col("__cut"),
      expr("(__rank - 1) DIV (__base + 1) + 1"))
      .otherwise(expr("__rem + (__rank - 1 - __cut) DIV __base + 1"))
    ranked.withColumn(out, tile.cast("int"))
      .drop("__pid", "__lrn", "__offset", "__cnt", "__n_total",
        "__rank", "__base", "__rem", "__cut")
  }

  /** RFM customer segmentation — the classic CRM cube: per customer,
    * Recency (latest order date), Frequency (order count), Monetary
    * (DECIMAL order-value sum), each quartiled independently (1 = best,
    * ties broken by customer key), then the 4×4×4 segment rollup with
    * customer counts and value totals. Three [[globalNtile]] passes
    * over CUSTOMER-grain rows — the rankings never touch the order
    * table again after the one grain-reducing aggregate.
    */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("recency"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("monetary"))
    val q = Seq(
      (Seq(col("recency").desc, col("custkey")), "r_q"),
      (Seq(col("frequency").desc, col("custkey")), "f_q"),
      (Seq(col("monetary").desc, col("custkey")), "m_q"))
      .foldLeft(cust) { case (df, (ord, name)) => globalNtile(df, ord, 4, name) }
    q.groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary")).cast("decimal(28,2)").as("segment_value"))
  }

  val rfmSql: String =
    """WITH cust AS (
      |  SELECT o_custkey AS custkey, MAX(o_orderdate) AS recency,
      |         CAST(COUNT(*) AS BIGINT) AS frequency,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS monetary
      |  FROM orders GROUP BY 1
      |), q AS (
      |  SELECT custkey, monetary,
      |         NTILE(4) OVER (ORDER BY recency DESC, custkey) AS r_q,
      |         NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f_q,
      |         NTILE(4) OVER (ORDER BY monetary DESC, custkey) AS m_q
      |  FROM cust
      |)
      |SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |       CAST(SUM(monetary) AS DOUBLE) AS segment_value
      |FROM q GROUP BY 1, 2, 3""".stripMargin

  val userDecilesSql: String =
    """WITH spend AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS spend
      |  FROM events GROUP BY 1
      |), ranked AS (
      |  SELECT *, NTILE(10) OVER (ORDER BY spend DESC, user_id) AS decile
      |  FROM spend
      |)
      |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
      |       CAST(SUM(n_events) AS BIGINT) AS n_events,
      |       CAST(SUM(spend) AS DOUBLE) AS decile_spend
      |FROM ranked GROUP BY 1""".stripMargin

  /** Set-operator coverage: INTERSECT (users who both purchased and
    * refunded... the fixture has clicks/purchases — use purchase ∩
    * signup) and EXCEPT (purchasers who never clicked). Spark plans
    * both as aggregates/semi-anti joins on the distinct key — the
    * relational set ops the reference's UNION leg doesn't cover.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct()
    val both = users("purchase").intersect(users("signup"))
      .agg(count(lit(1)).as("n")).select(lit("purchase_and_signup").as("set_op"), col("n"))
    val only = users("purchase").except(users("click"))
      .agg(count(lit(1)).as("n")).select(lit("purchase_minus_click").as("set_op"), col("n"))
    both.unionAll(only)
  }

  val setOpsSql: String =
    """SELECT 'purchase_and_signup' AS set_op, CAST(COUNT(*) AS BIGINT) AS n FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      |  INTERSECT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
      |UNION ALL
      |SELECT 'purchase_minus_click' AS set_op, CAST(COUNT(*) AS BIGINT) AS n FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      |  EXCEPT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click')""".stripMargin

  /** Grouped Pearson correlation + stddevs: quantity vs extended price
    * per return flag, assembled from exact DECIMAL moment sums (the
    * only way corr is reproducible across engines and partitionings —
    * float moment accumulation is order-dependent, decimal is not).
    * One map-side-combined aggregate; moments leave the scan as 6
    * decimals per group.
    */
  def corrQtyPrice(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,2)")
    val y = col("l_extendedprice").cast("decimal(18,2)")
    val m = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * x).cast("decimal(28,4)")).as("sxx"),
        sum((y * y).cast("decimal(28,4)")).as("syy"),
        sum((x * y).cast("decimal(28,4)")).as("sxy"))
    val nd = col("n").cast("double")
    val covN = col("sxy").cast("double") / nd -
      (col("sx").cast("double") / nd) * (col("sy").cast("double") / nd)
    val vxN = col("sxx").cast("double") / nd -
      (col("sx").cast("double") / nd) * (col("sx").cast("double") / nd)
    val vyN = col("syy").cast("double") / nd -
      (col("sy").cast("double") / nd) * (col("sy").cast("double") / nd)
    m.select(col("l_returnflag"), col("n"),
      sqrt(vxN).cast("decimal(18,6)").as("std_qty"),
      sqrt(vyN).cast("decimal(18,6)").as("std_price"),
      (covN / sqrt(vxN * vyN)).cast("decimal(18,6)").as("corr_qty_price"))
  }

  val corrQtyPriceSql: String =
    """WITH m AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
      |           * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sxx,
      |         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS syy,
      |         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
      |           * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sxy
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT l_returnflag, n,
      |  CAST(CAST(sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |    - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |    AS DECIMAL(18,6)) AS DOUBLE) AS std_qty,
      |  CAST(CAST(sqrt(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      |    - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
      |    AS DECIMAL(18,6)) AS DOUBLE) AS std_price,
      |  CAST(CAST(
      |    (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
      |    / sqrt((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |        - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |      * (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      |        - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
      |    AS DECIMAL(18,6)) AS DOUBLE) AS corr_qty_price
      |FROM m""".stripMargin
}
