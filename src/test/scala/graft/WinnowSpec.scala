package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, WinnowUtil}
import graft.ops.{Dedup, Winnow}

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference implementation (independent of the Expression
    * code path): k-gram hashes, leftward window scan, rightmost min.
    */
  private def reference(s: String, k: Int = 12, w: Int = 8): Seq[Long] = {
    val hashes = WinnowUtil.rollingHashes(s.getBytes("UTF-8"), k)
    if (hashes.isEmpty) return Seq.empty
    val sel = scala.collection.mutable.LinkedHashSet.empty[Long]
    var last = -1
    for (start <- 0 until math.max(1, hashes.length - w + 1)) {
      val end = math.min(start + w, hashes.length)
      var m = start
      for (i <- start until end)
        if (java.lang.Long.compareUnsigned(hashes(i), hashes(m)) <= 0) m = i
      if (m != last) { sel += hashes(m); last = m }
    }
    sel.toSeq.sorted
  }

  test("expression output matches the reference implementation (codegen path)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "abcdefghijklmnopqrstuvwxyz",
      "aaaaaaaaaaaaaaaa", // degenerate: identical hashes → tie-breaking
      "exactly12chr",     // == k chars → single hash
      "tiny"              // < k chars → empty
    )
    GraftFunctions.register(spark)
    val got = texts.toDF("t")
      .select(expr("winnow_fingerprint(t)")).as[Seq[Long]].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g === reference(t), s"mismatch for '$t'")
    }
  }

  test("shared long substrings guarantee shared fingerprints") {
    val common = "a very long shared passage that both documents quote verbatim here"
    val d1 = s"prefix one $common suffix alpha"
    val d2 = s"totally different opening $common and another ending"
    val f1 = reference(d1).toSet
    val f2 = reference(d2).toSet
    assert((f1 & f2).nonEmpty, "winnowing guarantee violated")
  }

  test("winnow near-dups find the planted near-duplicate documents") {
    val winnowPairs = Winnow.nearDups(spark, sf0001, threshold = 0.4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val minhashPairs = Dedup.nearDups(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(minhashPairs.nonEmpty)
    val recall = minhashPairs.count(winnowPairs.contains).toDouble / minhashPairs.length
    assert(recall >= 0.9, s"winnow recall vs minhash truth: $recall")
  }

  test("SQL registration works (spark.sql path)") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf0001).limit(5).createOrReplaceTempView("docs_tmp")
    val n = spark.sql(
      "SELECT doc_id, size(winnow_fingerprint(text)) AS nf FROM docs_tmp")
      .filter(col("nf") > 0).count()
    assert(n === 5)
  }
}
