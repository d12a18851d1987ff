package graft

import java.nio.file.Files

import graft.ops.{AnnParams, Ivf, Pq}
import graft.tools.ClusteredFixture

/** IVF / residual-PQ demonstrations that REQUIRE cluster structure (the
  * driver testdata is isotropic-random — IVF's worst case, where the
  * probe fraction must be ~3/4 and residuals barely differ from raw
  * vectors). On a seeded mixture-of-Gaussians corpus both claims become
  * measurable and deterministic (fixed seeds, fixed-order float math):
  *
  *  - the IVF scan reduction: ≥ 0.9 recall probing ≤ 1/4 of the lists;
  *  - residual encoding (true IVF-PQ): higher ADC recall than raw codes
  *    at the same 4-bit budget.
  */
class ClusteredIvfSpec extends SparkSpec {

  // σ = 0.05 in 64 dims → noise norm ≈ 0.4 against unit-distance
  // centers: well-separated clusters of ~62 members, the regime real
  // embedding corpora live in
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_clustered_spec").toString
    ClusteredFixture.write(spark, d, n = 2000, clusters = 32, sigma = 0.05)
    d
  }

  test("clustered corpus: recall@10 >= 0.9 probing <= 1/4 of the IVF lists") {
    val nc = AnnParams.nCentroids(AnnParams.corpusSize(spark, dir))
    val quarter = math.max(1, nc / 4)
    val recall = ClusteredFixture.recallOf(spark, dir,
      Ivf.topKWith(spark, dir, Ivf.centroids(spark, dir),
        Ivf.assignments(spark, dir), quarter))
    info(f"recall@10 at nProbe=$quarter of $nc lists = $recall%.3f (measured 0.965)")
    assert(recall >= 0.9,
      f"clustered corpus should reach 0.9 recall probing ≤ 1/4 of lists, got $recall%.3f")
  }

  test("residual codes out-rank raw codes at the same 4-bit budget (ADC-only)") {
    // shortlist = k makes the exact rerank a pure rescoring of the ADC
    // top-10, so this measures the ENCODING, not the rerank
    val residual = ClusteredFixture.recallOf(spark, dir,
      Pq.ivfPqTopK(spark, dir, k = 10, shortlist = 10))
    val raw = ClusteredFixture.recallOf(spark, dir, Pq.topK(spark, dir))
    info(f"ADC recall@10: residual=$residual%.3f raw=$raw%.3f (measured 0.308 vs 0.210)")
    assert(residual >= raw + 0.05,
      f"residual ADC ($residual%.3f) should clearly beat raw ADC ($raw%.3f)")
  }

  test("the composed IVF-PQ stack recovers full recall with shortlist+rerank") {
    val stack = ClusteredFixture.recallOf(spark, dir, Pq.ivfPqTopK(spark, dir))
    info(f"IVF-PQ shortlist=100 + exact rerank recall@10 = $stack%.3f")
    assert(stack >= 0.95)
  }
}
