package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.ops.{AnnParams, EventsOps, Ivf, Salting, Similarity}

/** Evidence for the scale techniques the 100 TB design leans on:
  * salting produces identical results through a skew-immune plan, and
  * bucketing eliminates the join shuffle entirely (the claim in
  * Bronze.scala's scaladoc, made checkable).
  */
class ScaleTechniquesSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("salted aggregation returns exactly the plain groupBy result") {
    val plain = EventsOps.topUsers(spark, sf0001, k = 1000)
      .as[(Long, Long, java.math.BigDecimal)].collect().toSeq
    val salted = Salting.topUsersSalted(spark, sf0001, k = 1000)
      .as[(Long, Long, java.math.BigDecimal)].collect().toSeq
    assert(salted === plain)
  }

  test("salted plan spreads the hot key over (key, salt) partial groups") {
    val partials = Salting.saltedUserTotals(Tables.events(spark, sf0001))
    // the partial stage really fans a user across multiple salt groups
    val fanout = Tables.events(spark, sf0001)
      .withColumn("_salt", pmod(col("event_id"), lit(16)))
      .groupBy("user_id").agg(countDistinct("_salt").as("s"))
      .agg(max("s")).head().getLong(0)
    assert(fanout > 1)
    assert(partials.columns.toSeq === Seq("user_id", "n_events", "total_value"))
  }

  test("ANN knobs scale with the corpus, not as constants") {
    // plane count keeps expected bucket occupancy ≤ targetBucket at ANY n:
    // 2^planes ≥ n / targetBucket (the sub-quadratic candidate guarantee)
    for (n <- Seq(1L, 500L, 2000L, 1000000L, 10000000000L)) {
      val p = AnnParams.numPlanes(n)
      assert(p >= 8)
      assert(math.pow(2.0, p) * AnnParams.targetBucket >= n,
        s"2^$p buckets x ${AnnParams.targetBucket} must cover n=$n")
    }
    assert(AnnParams.numPlanes(2000) === 8) // test-SF regime: unchanged
    assert(AnnParams.numPlanes(10000000000L) === 27) // 100 TB regime
    // centroids follow the sqrt law: probe cost ~ nProbe * sqrt(n), not n/16
    assert(AnnParams.nCentroids(500) === 16)
    assert(AnnParams.nCentroids(10000000000L) === 50000)
    assert(AnnParams.ceilLog2(1) === 0)
    assert(AnnParams.ceilLog2(2) === 1)
    assert(AnnParams.ceilLog2(3) === 2)
    assert(AnnParams.ceilLog2(1L << 40) === 40)
    // probe count is a FRACTION of the centroid count (recall holds as n
    // grows), not a constant that would decay to zero coverage
    assert(AnnParams.nProbe(500) === 12)
    assert(AnnParams.nProbe(10000000000L) === 37500)
  }

  test("recall ground-truth query sample is capped at maxQueries") {
    // the predicate admits the LOWEST maxQueries query ids at ANY corpus
    // size — the brute-force truth is O(sample × corpus), never O(n²/mod)
    val admitted = spark.range(0, 500000).toDF("vec_id")
      .filter(graft.ops.AnnParams.queryPred(50)).count()
    assert(admitted === graft.ops.AnnParams.maxQueries)
    // below the cap boundary the predicate is plain mod-sampling (the
    // test-SF regime: results unchanged by the cap)
    val small = spark.range(0, 2000).toDF("vec_id")
      .filter(graft.ops.AnnParams.queryPred(50)).count()
    assert(small === 40)
  }

  test("winnow doc-freq cap scales quarter-power with the corpus") {
    import graft.ops.Winnow
    // test-SF regime unchanged (50 was tuned at n=500); worst-case pair
    // fan-out per fingerprint cap^2 grows O(sqrt(n/500)) — sublinear
    assert(Winnow.docFreqCap(spark, sf0001) === 50)
    val caps = Seq(500L, 50000L, 5000000L, 500000000L).map { n =>
      math.max(50, math.ceil(50.0 * math.sqrt(math.sqrt(n / 500.0))).toInt)
    }
    assert(caps === Seq(50, 159, 500, 1582))
    // cap^2 / n (pair rows per fingerprint over corpus size) shrinks
    val ratios = Seq(500L, 5000000L).map(n =>
      math.pow(math.ceil(50.0 * math.sqrt(math.sqrt(n / 500.0))), 2) / n)
    assert(ratios.head > ratios.last)
  }

  test("LSH buckets and IVF lists stay bounded on real data") {
    val n = AnnParams.corpusSize(spark, sf0001)
    val buckets = Similarity.bucketStats(spark, sf0001)
      .agg(max("n_vectors"), count(lit(1))).head()
    val (maxBucket, nBuckets) = (buckets.getLong(0), buckets.getLong(1))
    assert(nBuckets > 1, "LSH must actually spread the corpus")
    assert(maxBucket <= AnnParams.targetBucket,
      s"max bucket $maxBucket exceeds the occupancy target")
    val maxList = Ivf.listStats(spark, sf0001).agg(max("n_vectors")).head().getLong(0)
    assert(maxList < n, "IVF must not collapse into one list")
  }

  // collectWithSubqueries descends into AdaptiveSparkPlanExec (a leaf to
  // plain collect — a bare plan.collect would make this check vacuous)
  private def shuffles(plan: SparkPlan): Int =
    collectWithSubqueries(plan) { case _: ShuffleExchangeExec => 1 }.sum

  test("z-ordered layout clusters BOTH filter dimensions per file") {
    // Z-ordering (bit-interleaving two filter keys into one sort key)
    // is the layout that makes parquet row-group min/max skipping work
    // for 2-D selective scans: a single-key sort clusters only its own
    // dimension, so predicates on the other key read every file. The
    // assertion is on the data property that drives the skipping — the
    // per-file span of each dimension — not on engine internals.
    val dir = "/root/testdata/sf0.01"
    // symmetric 5-bit interleave: both dimensions quantized to 32 cells
    // (unequal bit widths would let the wider key's high bits dominate
    // the ordering and the narrow key would not cluster at all)
    val nBits = 5
    def interleave(a: org.apache.spark.sql.Column,
                   b: org.apache.spark.sql.Column) =
      (0 until nBits).map { i =>
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }.reduce(_ + _)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), dayofmonth(col("ts")).cast("long").as("day"))
    // clamp to 31: user_id == 1500 would yield cell 32, whose bit 5 the
    // 5-bit interleave drops, silently aliasing the top users to cell 0
    val userCell = least((col("user_id") * 32 / 1500).cast("long"), lit(31L))
    val dayCell = col("day") - 1 // 0..30

    def spans(sorted: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val outDir = Files.createTempDirectory("zorder")
      try {
        sorted.write.mode("overwrite").parquet(outDir.toString)
        val s = spark.read.parquet(outDir.toString)
          .groupBy(input_file_name())
          .agg((max("user_id") - min("user_id")).as("us"),
            (max("day") - min("day")).as("ds"))
          .agg(avg("us"), avg("ds")).head()
        (s.getDouble(0), s.getDouble(1))
      } finally {
        import scala.jdk.CollectionConverters._
        Files.walk(outDir).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
      }
    }
    // both layouts: 8 range-partitioned, internally sorted files
    val (zUserSpan, zDaySpan) =
      spans(ev.withColumn("z", interleave(userCell, dayCell))
        .repartitionByRange(8, col("z")).sortWithinPartitions("z").drop("z"))
    val (uUserSpan, uDaySpan) =
      spans(ev.repartitionByRange(8, col("user_id"))
        .sortWithinPartitions("user_id"))
    // single-key sort: its own dimension clusters tightly, the other
    // spans the whole month — day predicates read every file
    assert(uUserSpan < 400, s"user-sort user span $uUserSpan")
    assert(uDaySpan > 25, s"user-sort day span $uDaySpan")
    // z-order: BOTH dimensions cluster well below their global spans
    // (1500 users / 30 days) — the per-dimension trade that buys joint
    // skipping
    assert(zUserSpan < 1000, s"z user span $zUserSpan")
    assert(zDaySpan < 15, s"z day span $zDaySpan")
  }

  test("z-order skipping is measured, strict, and matches the physical scan") {
    import graft.ops.Layout
    val rep = Layout.zorderSkipping(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val (zo, us) = (rep("zorder"), rep("user_sort"))
    // identical answers from both pruned reads…
    assert(zo.getLong(4) === us.getLong(4))
    // …but the z-ordered layout touches strictly fewer files AND rows
    assert(zo.getLong(2) < us.getLong(2),
      s"zorder scanned ${zo.getLong(2)} files vs user_sort ${us.getLong(2)}")
    assert(zo.getLong(3) < us.getLong(3))
    // the manifest prune IS the physical scan: the pruned read's
    // FileSourceScan reports exactly n_files_scanned files
    val base = graft.io.FsUtil.stateDir("zorder", sf0001)
    val layout = spark.read.parquet(s"$base/zorder")
    val manifest = layout.groupBy("file_id")
      .agg(min("un").as("unmin"), max("un").as("unmax"),
        min("dn").as("dnmin"), max("dn").as("dnmax"))
      .collect()
    val surviving = manifest.filter { r =>
      r.getLong(2) >= Layout.boxLo && r.getLong(1) <= Layout.boxHi &&
        r.getLong(4) >= Layout.boxLo && r.getLong(3) <= Layout.boxHi
    }.map(_.getInt(0))
    val pruned = layout.filter(col("file_id")
      .isin(surviving.map(Integer.valueOf).toSeq: _*))
    val qe = pruned.queryExecution
    qe.executedPlan.execute().count() // run THIS plan so metrics populate
    val scans = collectWithSubqueries(qe.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    assert(numFiles === surviving.length.toLong,
      s"physical scan read $numFiles files, manifest prune said ${surviving.length}")
  }

  test("bucketed tables join without a shuffle (the Bronze bucketing claim)") {
    // force sort-merge joins: at this SF everything fits the broadcast
    // threshold and BOTH joins would be shuffle-free, proving nothing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinCheck()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinCheck(): Unit = {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val bucketed = spark.table("li_b")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
    // sanity: same row count as the plain join (also finalizes AQE)
    val plainCount = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(bucketed.count() === plainCount)
    val plan = bucketed.queryExecution.executedPlan
    assert(shuffles(plan) === 0,
      s"bucketed join must not shuffle:\n${plan.treeString}")
    // negative control: the same check MUST see the shuffles of the
    // non-bucketed join (guards against a vacuous traversal)
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
    plain.count()
    assert(shuffles(plain.queryExecution.executedPlan) > 0)
  }

  test("AQE skew join splits the hot partition (the engine-side complement of salting)") {
    // Manual salting (events_top_users_salted) is the aggregation-side
    // skew tool and Salting.skewReport decides when it's warranted; for
    // JOINS Spark's own AQE skew handling is the production lever — a
    // skewed post-shuffle partition is split into advisory-sized slices
    // with the other side duplicated per slice. Prove it fires and that
    // results are unchanged.
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // the hot partition is a few MB at spec scale: lower the skew
      // detection floor and the advisory slice so the 100 TB behavior
      // reproduces in-miniature
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "128KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of left rows share one key — the classic hot-key join input
      val left = spark.range(0, 300000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(0, 1000)
        .select(col("id").as("k"), (col("id") * 7).as("w"))
      val joined = left.join(right, "k")
      // run THIS QueryExecution's adaptive plan (a .count() would spawn
      // its own and leave the inspected plan un-finalized)
      val qe = joined.queryExecution
      val n = qe.executedPlan.execute().count()
      val smjs = collectWithSubqueries(qe.executedPlan) {
        case smj: SortMergeJoinExec => smj
      }
      assert(smjs.nonEmpty, "expected a sort-merge join")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the join skew-handled:\n${joined.queryExecution.executedPlan}")
      // result parity with skew handling off
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plainN = left.join(right, "k").count()
      assert(n === plainN)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom-filter pruning fires on a selective shuffle join") {
    // The third scan-elimination lever beside DPP and z-order skipping:
    // when a SHUFFLE join's build side is small and selectively
    // filtered, Spark injects a bloom filter of the build keys into the
    // probe-side scan, dropping non-joining rows BEFORE the shuffle. At
    // 100 TB this is the difference between shuffling the whole fact
    // table and shuffling the ~4% that can match a filtered dimension.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local fixture scans are KBs; drop the probe-side size floor so
      // the 100 TB behavior reproduces in-miniature
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val l = Tables.lineitem(spark, sf0001).select("l_partkey", "l_quantity")
      val p = Tables.part(spark, sf0001)
        .filter(col("p_brand") === "Brand#1").select("p_partkey")
      val joined = l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter in plan:\n$planStr")
      val got = joined.head()
      // result parity with the runtime filter off
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val want = l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q")).head()
      assert(got.getLong(0) === want.getLong(0))
      assert(math.abs(got.getDouble(1) - want.getDouble(1)) < 1e-6)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning fires on the date-partitioned layout") {
    // the WindowReload layout: fact partitioned by event date. A join
    // against a FILTERED dim on the partition column must plan a
    // dynamicpruning subquery on the fact scan — at 100 TB this is what
    // turns "scan three years" into "scan the dim's surviving dates"
    // without the query author naming a date range.
    val base = "/tmp/graft_dpp/events_by_date"
    Tables.events(spark, sf0001)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(base)
    val dim = Tables.events(spark, sf0001)
      .select(to_date(col("ts")).as("event_date")).distinct()
      .orderBy("event_date").limit(3)
      .withColumn("flag", lit(1))
    dim.write.mode("overwrite").parquet("/tmp/graft_dpp/dim")
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    // local[] + tiny dim: allow DPP from the broadcast regardless of reuse
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      val fact = spark.read.parquet(base)
      val d = spark.read.parquet("/tmp/graft_dpp/dim").filter(col("flag") === 1)
      val joined = fact.join(d, Seq("event_date")).groupBy("event_type").count()
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n$planStr")
      // and the pruned result equals the statically-filtered recompute
      val dates = d.select("event_date").collect().map(_.getDate(0).toString)
      val direct = Tables.events(spark, sf0001)
        .filter(to_date(col("ts")).cast("string").isin(dates: _*))
        .groupBy("event_type").count()
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", prev)
  }

  test("CBO stats drive join reorder: smallest tables join first") {
    // statistics-driven planning — the lever that matters when the
    // syntactic join order is written by a human who doesn't know the
    // table sizes. Three managed tables joined big-first; with CBO +
    // ANALYZE the optimizer must re-order so the two small tables
    // reduce the big side before it ships.
    val db = "graft_cbo"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    import spark.implicits._
    (0L until 200000L).map(i => (i, i % 100, i % 7)).toDF("id", "k1", "k2")
      .write.mode("overwrite").saveAsTable(s"$db.big")
    (0L until 100L).map(i => (i, s"d$i")).toDF("k1", "a")
      .write.mode("overwrite").saveAsTable(s"$db.small1")
    (0L until 7L).map(i => (i, s"e$i")).toDF("k2", "b")
      .write.mode("overwrite").saveAsTable(s"$db.small2")
    Seq("big", "small1", "small2").foreach(t =>
      spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS"))
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevRo = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      // written worst-first: big x big-ish cross-key order
      val q = spark.sql(
        s"""SELECT count(*) FROM $db.big
           |JOIN $db.small1 ON big.k1 = small1.k1
           |JOIN $db.small2 ON big.k2 = small2.k2""".stripMargin)
      // the optimized plan carries rowCount stats (CBO active)...
      val stats = q.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined,
        "ANALYZE stats did not reach the optimized plan")
      // ...and both dimension joins plan as broadcasts of the SMALL side
      // (size known from stats, not file size)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("SortMergeJoin"),
        s"stats should broadcast both small sides:\n$plan")
      assert(q.head().getLong(0) === 200000L)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevRo)
      spark.sql(s"DROP DATABASE $db CASCADE")
    }
  }

  test("AQE coalesces over-provisioned shuffle partitions at runtime") {
    // the spill-safety corollary: provision shuffle.partitions for the
    // WORST stage and let AQE shrink the small ones — on a 1000-executor
    // cluster this is what makes one global setting workable. 64 initial
    // partitions over a tiny aggregate must coalesce to far fewer.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val df = Tables.events(spark, sf0001).groupBy("event_type").count()
      val rows = df.collect()
      assert(rows.length > 0)
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"AQE did not coalesce the 64 provisioned partitions:\n$plan")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    // the engine-native sibling of io/WindowReload's delete-then-insert:
    // INSERT OVERWRITE in dynamic mode rewrites exactly the partitions
    // the incoming frame touches; untouched partitions keep their
    // files byte-for-byte (same names — never rewritten).
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("dynover").toString + "/t"
    Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4)).toDF("p", "x")
      .write.partitionBy("p").parquet(base)
    def files(p: String) = {
      val d = new java.io.File(s"$base/p=$p")
      d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).sorted.toSeq
    }
    val (fa, fc) = (files("a"), files("c"))
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq(("b", 30), ("b", 31)).toDF("p", "x")
        .write.mode("overwrite").partitionBy("p").parquet(base)
      assert(files("a") === fa && files("c") === fc,
        "untouched partitions must keep their original files")
      val got = spark.read.parquet(base).as[(Int, String)].collect()
        .map { case (x, p) => (p, x) }.toSet
      assert(got === Set(("a", 1), ("a", 2), ("b", 30), ("b", 31), ("c", 4)))
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("parquet aggregate pushdown answers COUNT/MIN/MAX from footer stats") {
    // the fourth scan-elimination lever (beside DPP, z-order skipping,
    // and bloom pruning): an unfiltered COUNT/MIN/MAX never reads data
    // pages — the v2 parquet source answers it from row-group footer
    // metadata. At 100 TB that is the difference between a sub-second
    // table-stats probe and a full scan.
    val base = "/tmp/graft_aggpd/events"
    Tables.events(spark, sf0001).select("event_id", "user_id")
      .write.mode("overwrite").parquet(base)
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    val prevPd = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val agg = spark.read.parquet(base)
        .agg(count(lit(1)).as("n"), min("user_id").as("lo"),
          max("user_id").as("hi"))
      val planStr = agg.queryExecution.executedPlan.toString
      assert(planStr.contains("PushedAggregation: [COUNT(*), MIN(user_id), MAX(user_id)]"),
        s"aggregate not pushed to the parquet footer:\n$planStr")
      // and the metadata answer equals the data-page recompute
      val viaScan = Tables.events(spark, sf0001)
        .agg(count(lit(1)), min("user_id"), max("user_id")).head()
      assert(agg.head() === viaScan)
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", prevPd)
    }
  }
}
