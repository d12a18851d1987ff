package graft

import graft.io.AtomicPublish
import graft.ops.{Sketch, SketchState}

class SketchStateSpec extends SparkSpec {

  test("incremental fold over persisted state equals the full rebuild") {
    val inc = SketchState.incrementalReport(spark, sf0001)
      .select("scope", "n_exact", "mode", "hll_estimate").cache()
    val full = Sketch.hllDistinctUsers(spark, sf0001)
      .select("scope", "n_exact", "mode", "hll_estimate")
    assert(inc.count() > 0)
    assert(inc.except(full).count() === 0)
    assert(full.except(inc).count() === 0)
    inc.unpersist()
  }

  test("re-folding the same day is idempotent and versions advance") {
    val base = SketchState.baseFor(sf0001)
    val v0 = AtomicPublish.committed(spark, base)
    assert(v0 >= 0) // test 1 committed at least one version
    val r1 = SketchState.foldOnce(spark, sf0001)
      .select("scope", "hll_estimate").cache()
    val v1 = AtomicPublish.committed(spark, base)
    assert(v1 > v0) // each fold publishes a new committed version
    val r2 = SketchState.foldOnce(spark, sf0001)
      .select("scope", "hll_estimate")
    // day-replacement fold: running the same day again changes nothing
    assert(r1.except(r2).count() === 0)
    assert(r2.except(r1).count() === 0)
    // state stays one row per day — replacement, not accumulation
    val days = AtomicPublish.read(spark, base, "hll_days")
    assert(days.select("event_date").distinct().count() === days.count())
    r1.unpersist()
  }
}
