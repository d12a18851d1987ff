package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Debug aid: print per-micro-batch progress of the incremental watermark
  * harness. Usage: runMain graft.tools.StreamDebug <sfDir>
  */
object StreamDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = graft.streaming.EventStream.incrementalInput(spark, sfDir)
    println(s"input dir: $in")
    val fs = new org.apache.hadoop.fs.Path(in)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(in)).foreach { st =>
      println(s"  ${st.getPath.getName} mtime=${st.getModificationTime} len=${st.getLen}")
    }
    val q = spark.readStream.schema(graft.streaming.EventStream.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
      .withColumn("ts", timestamp_micros(col("ts")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.format("memory").queryName("dbg")
      .outputMode("append").start()
    q.processAllAvailable()
    q.explain()
    q.recentProgress.foreach { p =>
      val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).mkString(",")
      println(s"batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} droppedByWm=$dropped")
    }
    q.stop()
    println(s"emitted rows: ${spark.table("dbg").count()}")
    spark.stop()
  }
}
