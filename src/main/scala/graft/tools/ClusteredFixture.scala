package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{AnnParams, Ivf, Pq, Similarity}

/** Seeded mixture-of-Gaussians embedding fixture + the measurements that
  * need cluster structure to be demonstrable.
  *
  * The driver testdata's embeddings are isotropic-random (max pairwise
  * cosine ≈ 0.5) — IVF's worst case: true neighbors scatter uniformly
  * across lists, so the calibrated [[AnnParams.nProbe]] fraction is 3/4,
  * and residuals v − centroid(v) barely differ from v (all centroids sit
  * near the origin). Real-world embedding corpora are clustered, which is
  * the regime IVF and residual PQ are FOR. This fixture makes both
  * effects measurable:
  *
  *  - IVF scan reduction: recall@10 ≥ 0.9 probing ≤ 1/4 of the lists
  *    (vs 3/4 needed on the isotropic corpus) — asserted in
  *    ClusteredIvfSpec, reported by [[main]].
  *  - Residual PQ: the residual ADC ranking recovers what 4-bit raw
  *    codes lose, because within a list the residual spread is σ ≪ 1
  *    while raw vectors spread over the whole sphere.
  *
  * Generation is fully deterministic (per-cluster and per-point
  * `scala.util.Random` seeds): cluster centers are unit vectors, points
  * are center + σ·gaussian, `vec_id % clusters` round-robins clusters so
  * the first-k centroid seeding sees many distinct clusters.
  */
object ClusteredFixture {

  def write(spark: SparkSession, dir: String, n: Int = 2000,
            clusters: Int = 32, sigma: Double = 0.15,
            seed: Long = 42): Unit = {
    val dim = Similarity.dim
    val centers = Array.tabulate(clusters) { c =>
      val r = new scala.util.Random(seed + c)
      val v = Array.fill(dim)(r.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / norm)
    }
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val c = i % clusters
      val r = new scala.util.Random(seed * 1000003L + i)
      val e = centers(c).map(x => (x + sigma * r.nextGaussian()).toFloat)
      (i.toLong, e, s"cluster_$c")
    }
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** recall@10 of `approx` against the brute-force truth on `dir`. */
  def recallOf(spark: SparkSession, dir: String,
               approx: org.apache.spark.sql.DataFrame): Double = {
    val truth = Similarity.bruteForceTopK(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val denom = truth.count()
    val hits = truth
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count()
    hits.toDouble / denom
  }

  /** Usage: runMain graft.tools.ClusteredFixture [n clusters sigma] —
    * writes the fixture to a temp dir, sweeps nProbe, and compares raw
    * vs residual ADC recall.
    */
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000
    val clusters = if (args.length > 1) args(1).toInt else 32
    val sigma = if (args.length > 2) args(2).toDouble else 0.15
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_clustered").toString
    write(spark, dir, n, clusters, sigma)
    val nc = AnnParams.nCentroids(AnnParams.corpusSize(spark, dir))
    println(s"[clustered] n=$n clusters=$clusters sigma=$sigma nCentroids=$nc formulaNProbe=${AnnParams.nProbe(n)}")
    val cent = Ivf.centroids(spark, dir)
    val assign = Ivf.assignments(spark, dir)
    Seq(1, 2, nc / 8, nc / 4, nc / 2, 3 * nc / 4).distinct.filter(_ >= 1).foreach { np =>
      val r = recallOf(spark, dir, Ivf.topKWith(spark, dir, cent, assign, np))
      println(f"[clustered] nProbe=$np%3d (${np.toDouble / nc}%.2f of lists) recall@10=$r%.3f")
    }
    val raw = recallOf(spark, dir, Pq.topK(spark, dir))
    val resid = recallOf(spark, dir, Pq.ivfPqTopK(spark, dir, k = 10, shortlist = 10))
    println(f"[clustered] ADC recall@10: raw codes=$raw%.3f residual codes (IVF-PQ, shortlist=k)=$resid%.3f")
    val rawRr = recallOf(spark, dir, Pq.rerankTopK(spark, dir))
    val residRr = recallOf(spark, dir, Pq.ivfPqTopK(spark, dir))
    println(f"[clustered] shortlist-100+rerank recall@10: raw full-scan=$rawRr%.3f residual IVF-PQ=$residRr%.3f")
    spark.stop()
  }
}
