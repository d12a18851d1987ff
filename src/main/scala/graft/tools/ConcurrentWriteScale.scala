package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{AtomicPublish, CowTable}

/** Builder-side scale experiment: TWO REAL PARALLEL row-level writers
  * racing the manifest CAS (the SCALE.md measurement VERDICT r14 asked
  * for — AtomicPublishSpec pins interleaved publishers, but nothing had
  * measured live concurrent MERGE writers at 10×). Three protocols:
  *
  *   1. `disjoint` — two merges whose matched keys live in DIFFERENT
  *      files (lowest vs highest copy), run in parallel from two driver
  *      threads. Expected: at most one CAS retry (the loser lands at
  *      parent+1 on its second attempt); wall ≈ the slower writer, not
  *      the sum — row-level writers on disjoint ranges compose.
  *   2. `conflict` — two merges with DISJOINT KEYS (outcome stays
  *      deterministic) inside the SAME file range, so both rewrite the
  *      same files and the loser MUST recompute against the winner's
  *      state. Expected: retries observed, and the final aggregate
  *      equals both batches applied — the lost-update anomaly the CAS
  *      exists to prevent, asserted in-band.
  *   3. `pool_once` — an applyDelta (the SQL row-level commit half)
  *      forced into a conflict via its beforeCommit seam: the INSERT
  *      pool files are staged ONCE outside the retry loop
  *      (CowTable.applyDelta writes inserts before the CAS loop) and
  *      the losing attempt's deletion vector is reclaimed on retry —
  *      asserted by counting the pool directory before/after.
  *
  * Usage: runMain graft.tools.ConcurrentWriteScale <sfDir> [copies] [files]
  * Prints one JSON line per protocol for SCALE.md.
  */
object ConcurrentWriteScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val copies = if (args.length > 1) args(1).toInt else 10
    val files = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders0 = graft.Tables.orders(spark, src)
    val mx0 = orders0.agg(max("o_orderkey")).head().getLong(0) + 1
    val orders = (0 until copies).map(c =>
      orders0.withColumn("o_orderkey", col("o_orderkey") + lit(c * mx0)))
      .reduce(_ unionAll _)
      .localCheckpoint() // one evaluation for every protocol below
    val k = col("o_orderkey")

    def freshTable(tag: String): String = {
      val base = s"/tmp/graft_concwrite_$copies/$tag"
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      CowTable.create(spark, base, orders, "o_orderkey", numFiles = files)
      base
    }

    def bump(pred: org.apache.spark.sql.Column, by: Double): DataFrame =
      orders.filter(pred)
        .withColumn("o_totalprice", col("o_totalprice") + lit(by))
        .withColumn("_delete", lit(false))
        .localCheckpoint()

    def parallelMerge(base: String, b1: DataFrame, b2: DataFrame): (Double, Int, Int) = {
      val (n1, n2) = (new AtomicInteger, new AtomicInteger)
      val t0 = System.nanoTime()
      val t1 = new Thread(() => CowTable.merge(spark, base, b1, "o_orderkey",
        beforeCommit = () => { n1.incrementAndGet(); () }))
      val t2 = new Thread(() => CowTable.merge(spark, base, b2, "o_orderkey",
        beforeCommit = () => { n2.incrementAndGet(); () }))
      t1.start(); t2.start(); t1.join(); t2.join()
      ((System.nanoTime() - t0) / 1e9, n1.get(), n2.get())
    }

    // ---- 1. disjoint ranges (different files) -----------------------
    val loHi = mx0 / 8 // lowest eighth of copy 0
    val hiLo = (copies - 1).toLong * mx0 // the whole last copy's range
    val dB1 = bump(k < lit(loHi) && k % 7 === 0, 10.0)
    val dB2 = bump(k >= lit(hiLo) && k % 7 === 0, 100.0)
    val baseSeq = freshTable("seq")
    val tS = System.nanoTime()
    CowTable.merge(spark, baseSeq, dB1, "o_orderkey")
    CowTable.merge(spark, baseSeq, dB2, "o_orderkey")
    val seqWall = (System.nanoTime() - tS) / 1e9
    val baseD = freshTable("disjoint")
    val (dWall, d1, d2) = parallelMerge(baseD, dB1, dB2)
    val seqAgg = CowTable.statusAgg(CowTable.read(spark, baseSeq))
      .collect().toSeq
    val parAgg = CowTable.statusAgg(CowTable.read(spark, baseD))
      .collect().toSeq
    require(parAgg == seqAgg,
      "parallel disjoint merges must equal the sequential outcome")
    println(s"""{"exp":"disjoint","copies":$copies,"par_wall_s":$dWall,""" +
      s""""seq_wall_s":$seqWall,"attempts":[$d1,$d2]}""")

    // ---- 2. conflicting files, disjoint keys ------------------------
    // both batches live in the LOWEST eighth (same files); keys are
    // disjoint (k%2), so the serializable outcome is deterministic:
    // both bumps applied — the exact rows a lost update would drop
    val cB1 = bump(k < lit(loHi) && k % 2 === 0, 10.0)
    val cB2 = bump(k < lit(loHi) && k % 2 === 1, 100.0)
    val n1 = cB1.count()
    val n2 = cB2.count()
    val baseC = freshTable("conflict")
    val expect = orders.agg(
      sum(col("o_totalprice").cast("decimal(18,2)"))).head()
      .getDecimal(0).doubleValue() + 10.0 * n1 + 100.0 * n2
    val (cWall, c1, c2) = parallelMerge(baseC, cB1, cB2)
    val got = CowTable.read(spark, baseC).agg(
      sum(col("o_totalprice").cast("decimal(18,2)"))).head()
      .getDecimal(0).doubleValue()
    require(math.abs(got - expect) < 0.01,
      s"serializable CAS must apply BOTH conflicting batches: " +
        s"expected $expect got $got")
    println(s"""{"exp":"conflict","copies":$copies,"par_wall_s":$cWall,""" +
      s""""attempts":[$c1,$c2],"both_applied":true}""")

    // ---- 3. pool files written once across a forced CAS retry -------
    val baseP = freshTable("pool_once")
    val fs = new org.apache.hadoop.fs.Path(baseP)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def poolCount(): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(baseP, "files")).length
    val before = poolCount()
    val attempts = new AtomicInteger
    import spark.implicits._
    CowTable.applyDelta(spark, baseP,
      Seq(5L, 7L * mx0 / 8).toDF("o_orderkey"),
      inserts = Some(orders.filter(k % 5003 === 1)
        .withColumn("o_orderkey", k + lit(copies.toLong * mx0))),
      beforeCommit = () => {
        if (attempts.incrementAndGet() == 1) {
          // a competing append lands between discovery and the CAS
          CowTable.append(spark, baseP,
            orders.filter(k % 7001 === 2)
              .withColumn("o_orderkey", k + lit(2L * copies * mx0)))
          ()
        }
      })
    val after = poolCount()
    // growth = competing append (1) + delta inserts (1, written ONCE
    // despite the retry) + the final cumulative vector (1); the losing
    // attempt's vector was reclaimed on retry
    require(attempts.get() >= 2, "the forced conflict must retry the CAS")
    require(after - before == 3,
      s"pool must grow by exactly 3 entries (append + once-staged " +
        s"inserts + final vector), got ${after - before} after " +
        s"${attempts.get()} attempts")
    println(s"""{"exp":"pool_once","copies":$copies,""" +
      s""""attempts":${attempts.get()},"pool_growth":${after - before}}""")

    spark.stop()
  }
}
