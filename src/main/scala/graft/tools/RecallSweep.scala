package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{AnnParams, Ivf, Similarity}

/** Measures IVF recall@10 as a function of nProbe (tuning aid for the
  * [[graft.ops.AnnParams.nProbe]] formula).
  * Usage: runMain graft.tools.RecallSweep <sfDir> [nProbe ...]
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                 else Seq(2, 4, 6, 8, 12, 16, 24, 32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = AnnParams.corpusSize(spark, sfDir)
    val nc = AnnParams.nCentroids(n)
    println(s"[sweep] n=$n nCentroids=$nc formula nProbe=${AnnParams.nProbe(n)}")
    val truth = Similarity.bruteForceTopK(spark, sfDir)
      .select(col("query_id"), col("neighbor_id")).cache()
    val denom = truth.count()
    probes.filter(_ <= nc).foreach { np =>
      val hits = truth.join(
        Ivf.topK(spark, sfDir, nProbeOverride = np)
          .select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count()
      println(f"[sweep] nProbe=$np%3d recall=${hits.toDouble / denom}%.3f")
    }
    spark.stop()
  }
}
