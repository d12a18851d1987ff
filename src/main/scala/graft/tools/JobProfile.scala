package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time attribution for one registered query (guide §1):
  * a SparkListener records every job's duration, call site and task
  * count, so a multi-statement harness (the cow_* / stream_* checks)
  * can be decomposed into "N jobs of M ms each" — the constant the
  * bench numbers pay per statement — instead of guessing from code.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <query> [query ...]
  */
object JobProfile {

  private case class Rec(id: Int, desc: String, site: String,
                         start: Long, var end: Long = -1L,
                         var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "512"))
    // A/B experiments: SPARK_EXTRA_CONF="k1=v1;k2=v2"
    sys.env.get("SPARK_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) builder.config(kv.substring(0, i), kv.substring(i + 1))
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKRewrite.register(spark)
    val recs = new java.util.concurrent.ConcurrentHashMap[Int, Rec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
        recs.put(js.jobId, Rec(js.jobId, desc, site, js.time,
          tasks = js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(recs.get(je.jobId)).foreach(_.end = je.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // replicate Bench's warm-up: run once at sf0.001 so the timed pass
    // measures execution, not JIT + codegen compilation
    if (sys.env.get("SPARK_PROFILE_WARM").forall(_ == "1"))
      args.drop(1).foreach { n =>
        try graft.Memo.tracking(n) {
          graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
            .write.format("noop").mode("overwrite").save()
        } catch { case _: Throwable => }
      }
    args.drop(1).foreach { n =>
      recs.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val rs = recs.values().asScala.toSeq.sortBy(_.id)
      val jobSum = rs.map(r => math.max(0L, r.end - r.start)).sum / 1e3
      println(f"[profile] $n wall=$wall%.2f s, jobs=${rs.size}, " +
        f"job-time-sum=$jobSum%.2f s, gap=${wall - jobSum}%.2f s")
      rs.foreach { r =>
        val dt = if (r.end < 0) -1.0 else (r.end - r.start) / 1e3
        println(f"[profile]   job ${r.id}%4d ${dt}%7.3f s tasks=${r.tasks}%4d  ${r.site}  ${r.desc.take(60)}")
      }
    }
    spark.stop()
  }
}
