package graft

import org.apache.spark.sql.functions._

import graft.functions.WordNgramFunctions

/** The custom table-generating function (Catalyst Generator) behind the
  * shingle/n-gram fan-outs: must be row-for-row identical to the
  * explode(transform(sequence(...))) chain it replaced.
  */
class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def chain(n: Int) =
    explode(transform(sequence(lit(0), size(col("ws")) - n),
      i => concat_ws(" ",
        (0 until n).map(j => element_at(col("ws"), i + j + 1)): _*)))

  test("generator output equals the explode(transform(sequence)) chain") {
    val docs = Seq(
      "the quick brown fox jumps",
      "a b",
      "single",
      "x y z").toDF("text")
      .select(monotonically_increasing_id().as("id"),
        split(col("text"), " ").as("ws"))
    for (n <- Seq(2, 3)) {
      // production callers guard size(ws) >= n — the chain otherwise
      // errors on short docs (sequence runs backwards into index 0)
      val guarded = docs.filter(size(col("ws")) >= n)
      val old = guarded.select(col("id"), chain(n).as("g"))
        .as[(Long, String)].collect().sorted.toSeq
      val nu = guarded.select(col("id"),
        WordNgramFunctions.wordNgrams(spark, col("ws"), n).as("g"))
        .as[(Long, String)].collect().sorted.toSeq
      assert(nu === old && nu.nonEmpty, s"n=$n")
    }
  }

  test("null words inside a window are skipped, like concat_ws") {
    val df = Seq(1).toDF("x")
      .select(array(lit("a"), lit(null).cast("string"), lit("b")).as("ws"))
    // windows (a,null) and (null,b): concat_ws drops the null, leaving
    // the surviving word alone — same as the chain it replaced
    val rows = df.select(
      WordNgramFunctions.wordNgrams(spark, col("ws"), 2).as("g"))
      .as[String].collect().sorted.toSeq
    assert(rows === Seq("a", "b"))
  }

  test("short or null arrays produce no rows") {
    val df = Seq(1).toDF("x").select(array(lit("only")).as("ws"))
    assert(df.select(WordNgramFunctions.wordNgrams(spark, col("ws"), 3))
      .count() === 0L)
    val nullDf = Seq(1).toDF("x")
      .select(lit(null).cast("array<string>").as("ws"))
    assert(nullDf.select(WordNgramFunctions.wordNgrams(spark, col("ws"), 2))
      .count() === 0L)
  }

  test("usable as a SQL table-generating function") {
    WordNgramFunctions.register(spark)
    val out = spark.sql(
      "SELECT word_ngrams(array('a','b','c'), 2) AS g")
      .as[String].collect().sorted.toSeq
    assert(out === Seq("a b", "b c"))
    // and in a LATERAL VIEW, the classic UDTF position
    val lv = spark.sql(
      """SELECT g FROM (SELECT array('x','y','z') AS ws)
        |LATERAL VIEW word_ngrams(ws, 3) t AS g""".stripMargin)
      .as[String].collect().toSeq
    assert(lv === Seq("x y z"))
  }
}
