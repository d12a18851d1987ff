package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import graft.pipeline.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def cur(rows: (String, String, String)*) =
    rows.toDF("nk", "attr", "from")
      .select(col("nk"), col("attr"),
        col("from").cast("date").as("effective_from"),
        lit(null).cast("date").as("effective_to"),
        lit(true).as("current_flag"))

  private val asOf = LocalDate.parse("2024-01-01")

  test("scd2 merge: unchanged kept, changed closed+reopened, new opened") {
    val current = cur(("a", "x", "2023-01-01"), ("b", "y", "2023-01-01"))
    val updates = Seq(("a", "x"), ("b", "z"), ("c", "w")).toDF("nk", "attr")
    val out = Scd2.merge(current, updates, "nk", Seq("attr"), asOf)
      .select(col("nk"), col("attr"), col("effective_from").cast("string"),
        col("effective_to").cast("string"), col("current_flag"))
      .as[(String, String, String, String, Boolean)].collect().toSet
    assert(out === Set(
      ("a", "x", "2023-01-01", null, true),            // unchanged
      ("b", "y", "2023-01-01", "2023-12-31", false),   // closed
      ("b", "z", "2024-01-01", null, true),            // reopened
      ("c", "w", "2024-01-01", null, true)))           // first version
  }

  test("scd2 merge: NULL-transition counts as a change, NULL==NULL does not") {
    val current = cur(("a", null, "2023-01-01"), ("b", null, "2023-01-01"))
    val updates = Seq(("a", Option("x")), ("b", Option.empty[String]))
      .toDF("nk", "attr")
    val out = Scd2.merge(current, updates, "nk", Seq("attr"), asOf)
    assert(out.count() === 3) // a closed + a reopened + b untouched
    assert(out.filter(col("nk") === "b" && col("current_flag")).count() === 1)
  }

  test("scd2 merge is idempotent: reapplying the same state changes nothing") {
    val current = cur(("a", "x", "2023-01-01"))
    val updates = Seq(("a", "y")).toDF("nk", "attr")
    val once = Scd2.merge(current, updates, "nk", Seq("attr"), asOf)
    // reapply the same update batch to the surviving CURRENT set
    val again = Scd2.merge(
      once.filter(col("current_flag")), updates, "nk", Seq("attr"), asOf)
      .unionByName(once.filter(!col("current_flag")))
    assert(again.exceptAll(once).count() === 0)
    assert(once.exceptAll(again).count() === 0)
  }
}
