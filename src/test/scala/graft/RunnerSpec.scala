package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

class RunnerSpec extends SparkSpec {
  import spark.implicits._

  test("dim surrogate ids are stable across incremental runs (M2 grow-only)") {
    val wh = Files.createTempDirectory("runner").toString
    // first half-year window
    PipelineRunner.run(spark, sf0001, wh,
      LocalDate.parse("2023-01-01"), LocalDate.parse("2023-06-30"))
    val before = graft.io.AtomicPublish.read(spark, s"$wh/star", "dim_customer")
      .select("customer_name", "customer_id").as[(String, Long)].collect().toMap
    assert(before.nonEmpty)

    // widen to the full year: previously-assigned ids must not move
    PipelineRunner.run(spark, sf0001, wh,
      LocalDate.parse("2023-01-01"), LocalDate.parse("2023-12-31"))
    val after = graft.io.AtomicPublish.read(spark, s"$wh/star", "dim_customer")
      .select("customer_name", "customer_id").as[(String, Long)].collect().toMap
    before.foreach { case (nk, id) =>
      assert(after(nk) === id, s"surrogate id for '$nk' was renumbered")
    }
    // new keys (if any) got ids beyond the previous max
    val newKeys = after.keySet -- before.keySet
    newKeys.foreach { nk => assert(after(nk) > before.values.max) }

    // fact foreign keys resolve against the grown dim
    val fact = graft.io.AtomicPublish.read(spark, s"$wh/star", "fact")
    val dimIds = after.values.toSet
    val badFk = fact.filter(col("customer_id").isNotNull)
      .select("customer_id").as[Long].collect().filterNot(dimIds)
    assert(badFk.isEmpty)
  }
}
