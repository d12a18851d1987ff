package graft

import org.apache.spark.sql.functions._

/** Eviction contract of the session memo: a family is dropped after its
  * last tracked user, a drop degrades to recompute (never a wrong
  * result), untracked families stay put, and the family of every entry
  * is DECLARED at the call site (auditable census — no name heuristics).
  */
class MemoSpec extends SparkSpec {

  private def frame() = spark.range(5).toDF("x").withColumn("y", col("x") * 2)

  test("evictAfter drops a family once its last tracked user ran") {
    var builds = 0
    def build() = { builds += 1; frame() }
    Memo.tracking("memo_spec_qa") {
      Memo(spark, "memo_spec_fam_10", "dirA", "memo_spec_fam")(build()).count()
    }
    Memo.tracking("memo_spec_qb") {
      Memo(spark, "memo_spec_fam_10", "dirA", "memo_spec_fam")(build()).count()
    }
    assert(builds === 1) // second call hit the memo
    Memo.evictAfter("memo_spec_qa") // NOT the last user — must keep it
    Memo(spark, "memo_spec_fam_10", "dirA", "memo_spec_fam")(build()).count()
    assert(builds === 1)
    Memo.evictAfter("memo_spec_qb") // last user → evicted
    Memo(spark, "memo_spec_fam_10", "dirA", "memo_spec_fam")(build()).count()
    assert(builds === 2) // recomputed, correctly
  }

  test("eviction covers all dirs and parameterizations of a declared family") {
    var builds = 0
    def build() = { builds += 1; frame() }
    Memo.tracking("memo_spec2_q") {
      Memo(spark, "memo_spec2_fam_10_50", "dirA", "memo_spec2_fam")(build()).count()
      Memo(spark, "memo_spec2_fam_10_99", "dirB", "memo_spec2_fam")(build()).count()
    }
    assert(builds === 2)
    Memo.evictAfter("memo_spec2_q")
    Memo(spark, "memo_spec2_fam_10_50", "dirA", "memo_spec2_fam")(build()).count()
    Memo(spark, "memo_spec2_fam_10_99", "dirB", "memo_spec2_fam")(build()).count()
    assert(builds === 4) // both parameterizations of the family evicted
  }

  test("untracked memo entries are never evicted") {
    var builds = 0
    def build() = { builds += 1; frame() }
    Memo(spark, "memo_spec3_untracked", "dirA", "memo_spec3_untracked")(build()).count()
    Memo.evictAfter("memo_spec3_anything")
    Memo(spark, "memo_spec3_untracked", "dirA", "memo_spec3_untracked")(build()).count()
    assert(builds === 1)
  }

  test("dropFamily evicts regardless of tracking (Bench's fresh-rerun hook)") {
    var builds = 0
    def build() = { builds += 1; frame() }
    Memo(spark, "memo_spec4_x", "dirA", "memo_spec4")(build()).count()
    Memo.dropFamily("memo_spec4")
    Memo(spark, "memo_spec4_x", "dirA", "memo_spec4")(build()).count()
    assert(builds === 2)
  }

  test("census: parameterized memo names declare an SF-invariant family") {
    // the same operator at two corpus sizes memoizes under DIFFERENT
    // names (corpus-scaled knobs are in the name) but must declare the
    // SAME family, or Bench's warm-up census (sf0.001) could never evict
    // the timed run's frames (sf0.1) — the r7 regex this replaced was
    // only heuristically right about that
    graft.ops.Ivf.topK(spark, sf0001).count()
    val ivfNames = Seq("ivf_topk_10_50_12", "ivf_centroids_2", "ivf_assignments")
      .flatMap(n => Memo.familyOf(n).map(n -> _))
    assert(ivfNames.toMap.get("ivf_topk_10_50_12").contains("ivf_topk"),
      s"expected declared family ivf_topk, census: $ivfNames")
    assert(ivfNames.toMap.get("ivf_centroids_2").contains("ivf_centroids"))
  }
}
