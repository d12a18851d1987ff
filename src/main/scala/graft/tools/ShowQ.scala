package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Prints a named registered query's result (debug aid).
  * Usage: runMain graft.tools.ShowQ <sfDir> <query> [rows]
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 2) args(2).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(args(1))(spark, sfDir).show(n, truncate = false)
    spark.stop()
  }
}
