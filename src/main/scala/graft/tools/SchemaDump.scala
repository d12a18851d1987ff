package graft.tools
import org.apache.spark.sql.SparkSession
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = Seq("region","nation","customer","supplier","part","orders",
      "lineitem","documents","embeddings").map(t => t -> graft.Tables(spark, dir, t))
    val all = src ++ Seq(
      "events" -> graft.Tables.events(spark, dir),
      "bronze" -> graft.pipeline.Bronze(spark, dir),
      "silver" -> graft.pipeline.Pipeline.silverCached(spark, dir),
      "fact" -> graft.pipeline.Pipeline.fact(spark, dir))
    all.foreach { case (n, df) =>
      println(s"[schema] $n=" + df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
    }
    spark.stop()
  }
}
