package graft

import org.apache.spark.sql.functions._

/** Eviction contract of the session memo: a family is dropped after its
  * last tracked user, a drop degrades to recompute (never a wrong
  * result), and untracked families stay put.
  */
class MemoSpec extends SparkSpec {

  private def frame() = spark.range(5).toDF("x").withColumn("y", col("x") * 2)

  test("evictAfter drops a family once its last tracked user ran") {
    var builds = 0
    def build() = { builds += 1; frame() }
    // family "memo_spec_fam" (suffix stripped) used by qa then qb
    Memo.tracking("memo_spec_qa") {
      Memo(spark, "memo_spec_fam_10", "dirA")(build()).count()
    }
    Memo.tracking("memo_spec_qb") {
      Memo(spark, "memo_spec_fam_10", "dirA")(build()).count()
    }
    assert(builds === 1) // second call hit the memo
    Memo.evictAfter("memo_spec_qa") // NOT the last user — must keep it
    Memo(spark, "memo_spec_fam_10", "dirA")(build()).count()
    assert(builds === 1)
    Memo.evictAfter("memo_spec_qb") // last user → evicted
    Memo(spark, "memo_spec_fam_10", "dirA")(build()).count()
    assert(builds === 2) // recomputed, correctly
  }

  test("eviction covers all dirs of a family, parameter suffixes included") {
    var builds = 0
    def build() = { builds += 1; frame() }
    Memo.tracking("memo_spec2_q") {
      Memo(spark, "memo_spec2_fam_10_50", "dirA")(build()).count()
      Memo(spark, "memo_spec2_fam_10_99", "dirB")(build()).count()
    }
    assert(builds === 2)
    Memo.evictAfter("memo_spec2_q")
    Memo(spark, "memo_spec2_fam_10_50", "dirA")(build()).count()
    Memo(spark, "memo_spec2_fam_10_99", "dirB")(build()).count()
    assert(builds === 4) // both parameterizations of the family evicted
  }

  test("untracked memo entries are never evicted") {
    var builds = 0
    def build() = { builds += 1; frame() }
    Memo(spark, "memo_spec3_untracked", "dirA")(build()).count() // no tracking
    Memo.evictAfter("memo_spec3_anything")
    Memo(spark, "memo_spec3_untracked", "dirA")(build()).count()
    assert(builds === 1)
  }
}
