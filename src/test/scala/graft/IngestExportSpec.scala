package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._
import graft.io.Export
import graft.pipeline.{Bronze, BronzeIngest, Pipeline}

class IngestExportSpec extends SparkSpec {

  test("quarantine split partitions bronze exactly; reasons populated (S4)") {
    val bronze = Bronze(spark, sf0001).cache()
    val good = BronzeIngest.good(bronze)
    val bad = BronzeIngest.quarantined(bronze)
    assert(good.count() + bad.count() === bronze.count())
    assert(bad.filter(col("quarantine_reason").isNull).count() === 0)
    // good rows satisfy every rule
    BronzeIngest.rules.foreach { case (name, pred) =>
      assert(good.filter(pred).count() === 0, s"rule $name leaked into good")
    }
    assert(bad.count() > 0, "injected anomalies must quarantine")
  }

  test("export migrates the window and reconciles counts (S7/S8)") {
    val base = Files.createTempDirectory("exp").toString
    val fact = Pipeline.fact(spark, sf0001)
    val r = Export.migrate(spark, fact, s"$base/staging", s"$base/target",
      LocalDate.parse("2023-01-01"), LocalDate.parse("2023-06-30"))
    assert(r.ok, s"reconciliation failed: $r")
    assert(r.staged > 0)
    // rerun is idempotent (M1 on the target)
    val r2 = Export.migrate(spark, fact, s"$base/staging", s"$base/target",
      LocalDate.parse("2023-01-01"), LocalDate.parse("2023-06-30"))
    assert(r2.ok && r2.loaded === r.loaded)
  }

  test("compliance purge deletes exactly the requested users, audited from files") {
    import org.apache.spark.sql.functions._
    val audit = graft.io.ReloadChecks.purgeUsers(spark, sf0001).cache()
    assert(audit.count() > 0, "fixture has no users matching the DSR predicate")
    // every audited user fully purged, with a positive deleted count
    assert(audit.filter(!col("purged")).count() === 0)
    assert(audit.filter(col("n_deleted") <= 0).count() === 0)
    // the audit covers exactly the users the predicate names
    val expected = Tables.events(spark, sf0001)
      .filter(col("user_id") % 97 === 13).select("user_id").distinct()
    assert(audit.select("user_id").exceptAll(expected).count() === 0 &&
      expected.exceptAll(audit.select("user_id")).count() === 0)
  }

  test("catalog schemas match produced frames; v_dm_task queryable (S9)") {
    assert(Catalog.conforms(
      Pipeline.silver(spark, sf0001).drop(), Catalog.silverSchema))
    assert(Catalog.conforms(Pipeline.fact(spark, sf0001), Catalog.factSchema))
    Catalog.registerViews(spark, sf0001)
    val n = spark.sql(
      "SELECT COUNT(*) FROM v_dm_task WHERE salary >= 0").head().getLong(0)
    assert(n > 0)
    // the reference's silver invariant, via SQL over the registered views
    assert(spark.sql(
      "SELECT COUNT(*) FROM t_sql_source_structured WHERE effective_to < effective_from")
      .head().getLong(0) === 0)
  }
}
