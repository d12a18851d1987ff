package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{AnnParams, Ivf, Similarity}

/** Measures IVF list balance (max/mean) and recall@10 per k-means round
  * count (tuning aid for [[graft.ops.Ivf.refineRounds]]).
  * Usage: runMain graft.tools.IvfTune <sfDir> [maxRounds]
  */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxRounds = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val truth = Similarity.bruteForceTopK(spark, sfDir)
      .select(col("query_id"), col("neighbor_id")).cache()
    val denom = truth.count()
    val np = AnnParams.nProbe(AnnParams.corpusSize(spark, sfDir))
    (0 to maxRounds).foreach { r =>
      val cent = Ivf.centroidsAt(spark, sfDir, r)
      val assign = Ivf.assignTo(spark, sfDir, cent).cache()
      val stats = assign
        .groupBy("centroid_id").agg(count(lit(1)).as("n"))
        .agg(max("n").cast("double").as("mx"), avg("n").as("mean")).head()
      val ratio = stats.getDouble(0) / stats.getDouble(1)
      val hits = truth.join(
        Ivf.topKWith(spark, sfDir, cent, assign, np)
          .select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count()
      assign.unpersist()
      println(f"[ivftune] rounds=$r maxOverMean=$ratio%.3f recall@10(np=$np)=${hits.toDouble / denom}%.3f")
    }
    spark.stop()
  }
}
