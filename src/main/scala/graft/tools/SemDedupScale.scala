package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Builder-side scale experiment for SemDeDup's cluster-bounded pair
  * stage (SCALE.md) — the two questions the 10× bench cannot answer:
  *
  *   1. PAIR LAW: on the DERIVED corpus (the registered
  *      `dedup_semantic_derived` input) candidate pairs grow
  *      ~n^1.5/const under the sqrt-law centroid count (Σ C(listᵢ,2)
  *      with balanced lists of n/nc) — measured from the real
  *      assignment's list statistics, no pairwise work.
  *   2. DEGENERATE DENSITY: one pathologically hot cluster (a true-dup
  *      family densified far beyond the sqrt-law) degrades the
  *      unbounded pair stage quadratically; the per-list pair bound
  *      (`semDedup(maxList = …)`, deterministic chunking + loud
  *      dropped-pairs report) must hold the wall near the balanced
  *      cost. Built as a `copies`× replica of the fixture embeddings
  *      where `hotPct`% of all copies are near-copies of ONE vector.
  *
  * Usage: runMain graft.tools.SemDedupScale <sfDir> [copies] [hotPct]
  */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val copies = if (args.length > 1) args(1).toInt else 50
    val hotPct = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- 1. pair law on the derived corpus (list stats only) --------
    val dAssign = graft.ops.Ivf.assignments(spark, src,
      graft.ops.Featurize.corpus)
    val dStats = dAssign.groupBy("centroid_id").agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).cast("long"), count(lit(1)),
        sum(col("n") * (col("n") - 1) / lit(2)).cast("long"),
        max(col("n")))
      .head()
    val (dn, dnc, dPairs) = (dStats.getLong(0), dStats.getLong(1),
      dStats.getLong(2))
    println(s"""{"part":"derived_pair_law","n":$dn,"lists":$dnc,""" +
      s""""cand_pairs":$dPairs,"pairs_per_n":${dPairs / math.max(1, dn)},""" +
      s""""max_list":${dStats.getLong(3)}}""")

    // ---- 2. degenerate density on a replicated corpus ---------------
    val base = Similarity.embCorpus.normalizedOf(spark, src)
      .select("vec_id", "v")
    val n0 = base.count()
    val minId = base.agg(min("vec_id")).head().getLong(0)
    val mx = base.agg(max("vec_id")).head().getLong(0) + 1
    // copy c of vector i; `hotPct`% of copies collapse onto vector
    // minId's position (the hot true-dup family), everyone else keeps
    // their own; a deterministic per-row epsilon on dim 0 keeps every
    // vector distinct (near-dup, not exact-dup)
    val hotVec = base.filter(col("vec_id") === minId)
      .select(col("v").as("hv")).head().getSeq[Double](0)
    val hv = typedlit(hotVec)
    val replicated = (0 until copies).map { c =>
      base.withColumn("_c", lit(c.toLong))
    }.reduce(_ unionAll _)
      .withColumn("vec_id", col("vec_id") + col("_c") * lit(mx))
      .withColumn("v",
        when((col("vec_id") % 100) < lit(hotPct.toLong), hv)
          .otherwise(col("v")))
      .withColumn("v", transform(col("v"), (x, i) =>
        x + when(i === 0, (col("vec_id") % 1000).cast("double") * lit(1e-6))
          .otherwise(lit(0.0))))
      .withColumn("norm", sqrt(aggregate(
        zip_with(col("v"), col("v"), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)))
      .select("vec_id", "v", "norm")
      .localCheckpoint()
    val n = replicated.count()
    val corpus = Similarity.VecCorpus(
      key = s"sdscale$copies",
      countTable = s"sdscale$copies",
      normalizedOf = (_, _) => replicated,
      countOf = (_, _) => n,
      embCte = "unused")
    val avgList = math.max(1L, n /
      graft.ops.AnnParams.nCentroids(n).toLong)

    def run(maxList: Int): (Double, Long, Long, Long) = {
      var lists = 0L
      var dropped = 0L
      val t0 = System.nanoTime()
      val rows = Similarity.semDedup(spark, src, threshold = 0.9,
        corpus = corpus, maxList = maxList,
        onBound = (l, d) => { lists = l; dropped = d }).count()
      ((System.nanoTime() - t0) / 1e9, rows, lists, dropped)
    }
    // index build (k-means over the replica) is shared by both runs —
    // bill it once so the two walls compare the PAIR stage
    val tIdx = System.nanoTime()
    graft.ops.Ivf.assignments(spark, src, corpus).count()
    val idxS = (System.nanoTime() - tIdx) / 1e9
    val (wallU, rowsU, _, _) = run(0)
    val (wallB, rowsB, bLists, bDropped) = run((4 * avgList).toInt)
    println(f"""{"part":"degenerate_density","n0":$n0,"copies":$copies,""" +
      f""""hot_pct":$hotPct,"n":$n,"index_s":$idxS%.1f,""" +
      f""""unbounded_s":$wallU%.1f,"unbounded_rows":$rowsU,""" +
      f""""bounded_s":$wallB%.1f,"bounded_rows":$rowsB,""" +
      f""""max_list":${4 * avgList},"oversized_lists":$bLists,""" +
      f""""dropped_pairs":$bDropped}""")
    spark.stop()
  }
}
