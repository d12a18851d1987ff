package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side single-query timer: run one registered query against a
  * fixture dir in a fresh session, timed cold and again warm (memo and
  * JIT in place), printing both — the isolation harness behind the
  * SCALE.md attribution notes. Usage:
  *
  *   runMain graft.tools.TimeQuery <sfDir> <query> [query…]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKRewrite.register(spark)
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val cold = (System.nanoTime() - t0) / 1e9
      graft.Memo.dropName(name)
      val t1 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"[time] $name cold=$cold%.2fs warm=$warm%.2fs ($dir)")
    }
    spark.stop()
  }
}
