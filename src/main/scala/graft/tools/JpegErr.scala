package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the max per-channel JPEG decode errors at a scale dir — the
  * calibration read behind `jpegCheck`'s tolerances.
  * Usage: runMain graft.tools.JpegErr <sfDir>
  */
object JpegErr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Multimodal.jpegErrors(spark, args(0))
      .agg(max("r_err"), max("g_err"), max("b_err")).show(false)
    spark.stop()
  }
}
