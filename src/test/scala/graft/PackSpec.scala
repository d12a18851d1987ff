package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Pack, TextMetrics}

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("assignments: two-tier prefix sum equals the single-window reference") {
    val got = Pack.assignments(spark, sf0001)
      .select("doc_id", "tok_start").as[(Long, Long)].collect().toMap
    // reference: naive global window (fine at test SF, the thing we avoid at scale)
    val ref = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        size(split(TextMetrics.normalized(col("text")), " ")).cast("long").as("t"))
      .filter(col("t") > 0)
      .withColumn("tok_start",
        coalesce(sum("t").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "tok_start").as[(Long, Long)].collect().toMap
    assert(got.size === ref.size)
    ref.foreach { case (id, s) => assert(got(id) === s, s"doc $id offset") }
  }

  test("pack: token conservation, full sequences except the tail, contiguous spans") {
    val rows = Pack.pack(spark, sf0001)
      .orderBy("seq_id")
      .select("seq_id", "n_docs", "seq_tokens", "first_doc", "last_doc")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf0001)
      .select(size(split(TextMetrics.normalized(col("text")), " ")).cast("long"))
      .as[Long].collect().sum
    // seq_ids are exactly 0..N-1 and every token lands in exactly one sequence
    assert(rows.map(_._1).toSeq === (0L until rows.length).toSeq)
    assert(rows.map(_._3).sum === total)
    // every sequence but the last is filled to exactly seqLen
    rows.init.foreach { r => assert(r._3 === Pack.seqLen, s"seq ${r._1} underfilled") }
    assert(rows.last._3 <= Pack.seqLen)
    // doc spans are contiguous: adjacent sequences share or abut a boundary doc
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 >= a._5 - 1 && b._4 <= a._5 + 1,
          s"seq ${b._1} first_doc ${b._4} not adjacent to seq ${a._1} last_doc ${a._5}")
      case _ =>
    }
    rows.foreach { r => assert(r._2 >= 1 && r._4 <= r._5) }
  }

  test("pack plan: the only single-partition stage is the bucket-level cumsum") {
    val phys = Pack.assignments(spark, sf0001)
      .queryExecution.executedPlan.toString()
    // tier 1 funnels only the aggregated bucket frame through one task;
    // nothing else in the plan may collapse to a single partition
    assert("Exchange SinglePartition".r.findAllMatchIn(phys).length === 1,
      s"expected exactly one single-partition exchange (tier-1 bucket cumsum):\n$phys")
    // both windows present: tier-1 bucket cumsum + tier-2 within-bucket
    // running sum (the latter hash-partitioned by bucket, hence not in
    // the SinglePartition count above)
    assert(phys.linesIterator.count(_.contains("Window [")) >= 2,
      "expected tier-1 and tier-2 window nodes")
    assert(phys.contains("hashpartitioning(bucket"),
      "tier-2 window must be hash-partitioned by bucket")
  }

  test("no-split bins: capacity respected, token conservation, waste accounted") {
    val docs = Tables.documents(spark, sf0001)
    val bins = Pack.bins(spark, sf0001).cache()
    val rows = bins.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bucketLen, nDocs, binTokens, oversize, waste) =
        (r.getAs[Long]("bucket_len"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("bin_tokens"), r.getAs[Boolean]("oversize"),
          r.getAs[Long]("waste"))
      if (!oversize) {
        // a non-oversize bin fits its budget: k_fit docs of ≤ bucket_len
        assert(binTokens + waste === Pack.seqLen.toLong,
          s"bin tokens $binTokens + waste $waste != ${Pack.seqLen}")
        assert(binTokens <= Pack.seqLen.toLong)
        assert(nDocs <= math.max(1L, Pack.seqLen.toLong / bucketLen))
      } else {
        assert(nDocs === 1L && waste === 0L, "oversize bins are dedicated")
      }
    }
    // every token of every non-empty doc lands in exactly one bin
    val totalBin = rows.map(_.getAs[Long]("bin_tokens")).sum
    val totalDoc = Pack.assignments(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("doc_tokens")).head().getLong(0)
    assert(totalBin === totalDoc, "no-split packing must conserve tokens")
  }
}
