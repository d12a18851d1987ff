package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The one-line plug-in story: a session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` carries every
  * custom function and the top-k strategy with no programmatic
  * registration — the deployment path for SQL-only surfaces.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("an extensions-built session carries all functions and the top-k strategy") {
    spark // force the shared session (and its SparkContext) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the programmatic twin of
      // `spark.sql.extensions=graft.functions.GraftExtensions` (the
      // config path binds at SparkContext creation, so a spec sharing
      // the suite's context must use the builder hook; both call the
      // same GraftExtensions.apply)
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark, "must be a fresh session, not the shared one")
      val expected = Seq("winnow_fingerprint", "nfc_normalize", "cdc_cuts",
        "feature_hash", "bloom_might_contain", "word_ngrams", "hll_sketch",
        "hll_merge", "kmv_sketch", "kmv_union")
      expected.foreach { name =>
        assert(s2.sessionState.functionRegistry
          .functionExists(FunctionIdentifier(name)), s"$name not injected")
      }
      // a scalar and an aggregate work end-to-end through pure SQL
      assert(s2.sql("SELECT nfc_normalize('café')").head().getString(0)
        === "café")
      assert(s2.sql(
        "SELECT size(feature_hash('hello world', 64))").head().getInt(0) === 64)
      val est = s2.sql(
        """SELECT size(kmv_sketch(CAST(x AS STRING), 8))
          |FROM range(100) t(x)""".stripMargin).head().getInt(0)
      assert(est === 8, "kmv buffer must hold exactly k minima")
      // the injected planner strategy serves window-filter top-k natively
      assert(s2.sessionState.planner.strategies
        .exists(_.isInstanceOf[graft.plans.TopKStrategy]),
        "TopKStrategy not injected")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
