package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dq.DqSuite
import graft.io.WindowReload
import graft.pipeline.{Bronze, Pipeline, Silver, Star}

/** The reference's `main.py` end-to-end pipeline
  * (`/root/reference/data-pipeline/src/main.py:6-39`) as a Spark batch job:
  *
  *   bronze (staging) → silver via the M1 window reload (the
  *   `fn_etl_data_load` delete+insert, materialized as date-partitioned
  *   parquet — the medallion materialization point that lets the star
  *   build fan out without recomputing the source join) → gold dims +
  *   fact (`fn_dm_data_load`) → DQ checks appended to a results dataset
  *   (`fn_dq_checks_load`) → row-count report (`final_report.py:22-43`).
  *
  * Audit columns (F13): silver carries `processed_at`, gold `created_dt`,
  * results `run_date` — the reference's CURRENT_TIMESTAMP/CURRENT_DATE
  * defaults (`01_init_all.sql:19,37`, `t_dim_tables.sql:5`).
  *
  * Usage: runMain graft.PipelineRunner <sfDir> <warehouseDir> [start end]
  */
object PipelineRunner {

  /** F13 audit clock: a fixed instant injected via the session conf
    * `spark.graft.run_ts` ('yyyy-MM-dd HH:mm:ss') makes the audit
    * columns (`processed_at`, `created_dt`) deterministic and therefore
    * oracle-checkable (the `star_publish` query); unset, they keep the
    * reference's CURRENT_TIMESTAMP / CURRENT_DATE semantics
    * (`01_init_all.sql:19,37`, `t_dim_tables.sql:5`).
    */
  def runTs(spark: SparkSession): org.apache.spark.sql.Column =
    spark.conf.getOption("spark.graft.run_ts")
      .map(s => lit(java.sql.Timestamp.valueOf(s)))
      .getOrElse(current_timestamp())

  def runDate(spark: SparkSession): org.apache.spark.sql.Column =
    spark.conf.getOption("spark.graft.run_ts")
      .map(s => lit(java.sql.Date.valueOf(s.substring(0, 10))))
      .getOrElse(current_date())

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val wh = args(1)
    val start = if (args.length > 2) LocalDate.parse(args(2)) else Pipeline.defaultStart
    val end = if (args.length > 3) LocalDate.parse(args(3)) else Pipeline.defaultEnd
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, wh, start, end)
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, wh: String,
          start: LocalDate, end: LocalDate): Unit = {
    // 1. silver: cleanse + idempotent window reload (fn_etl_data_load)
    val cleansed = Silver.cleanse(Bronze(spark, sfDir), Some(start), Some(end))
      .withColumn("processed_at", runTs(spark))
    WindowReload.reload(spark, s"$wh/silver", cleansed, start, end)
    // drop the audit column and the reload's partition key (eff_part) —
    // both are storage-side, not part of the silver contract
    val silver = WindowReload.read(spark, s"$wh/silver")
      .drop("processed_at", "eff_part")
    println(s"[runner] silver rows processed: ${silver.count()}")

    // 2. gold: dims + fact published as ONE ATOMIC VERSION (the
    //    reference runs `fn_dm_data_load` inside a single PG transaction,
    //    `fill_dm_table.py:18-23`; AtomicPublish restores that
    //    all-or-nothing contract on parquet — a crash between dataset
    //    writes leaves readers on the previous version). Dims are
    //    GROW-ONLY across runs (M2, `ON CONFLICT (nk) DO NOTHING` +
    //    SERIAL): existing surrogate ids are preserved, only new natural
    //    keys get fresh ids — a rebuild would renumber ids and silently
    //    re-key every previously-written fact row.
    val starBase = s"$wh/star"
    val havePrev = graft.io.AtomicPublish.exists(spark, starBase)
    val dims = Seq(
      ("dim_customer", "customer_id", "customer_name", "user_name"),
      ("dim_product", "product_id", "product_category", "product_category"),
      ("dim_region", "region_id", "region_name", "region"),
      ("dim_status", "status_id", "status_name", "customer_status"))
    val dimFrames = dims.map { case (name, idCol, nkCol, srcCol) =>
      val incoming = silver.select(col(srcCol).as(nkCol))
      val merged =
        if (havePrev) {
          val existing = graft.io.AtomicPublish.read(spark, starBase, name)
          val upserted = Star.upsertDim(
            existing.select(idCol, nkCol), incoming, idCol, nkCol)
          // keep each existing row's original created_dt (the reference's
          // ON CONFLICT DO NOTHING leaves conflicting rows untouched);
          // only genuinely new keys get today's date
          upserted
            .join(existing.select(col(nkCol), col("created_dt")), Seq(nkCol), "left")
            .withColumn("created_dt", coalesce(col("created_dt"), runDate(spark)))
        } else Star.dim(silver.select(col(srcCol)), srcCol, idCol, nkCol)
          .withColumn("created_dt", runDate(spark))
      // checkpoint: the frame must be FROZEN before the publish — it is
      // read again by the fact build, and (in the upsert branch) its
      // lineage points at the previous version dir, which the publish
      // prunes after the swap
      name -> merged.localCheckpoint(true)
    }
    val factFrame = Star.factWithDims(silver,
      dims.zip(dimFrames).map { case ((_, idCol, nkCol, _), (_, dim)) =>
        dim.select(idCol, nkCol)
      })
      .withColumn("created_dt", runDate(spark))
    graft.io.AtomicPublish.publish(spark, starBase,
      dimFrames :+ ("fact" -> factFrame))
    val fact = graft.io.AtomicPublish.read(spark, starBase, "fact")

    // 3. DQ checks appended to the results dataset (fn_dq_checks_load)
    val results = DqSuite.run(spark, silver, fact.drop("created_dt"))
    WindowReload.reloadResults(spark, s"$wh/dq_check_results", results, end)

    // 4. final report (final_report.py:22-43): per-table row counts —
    //    star members resolved through the committed manifest
    println(s"[runner] silver: ${WindowReload.read(spark, s"$wh/silver").count()} rows")
    println(s"[runner] dq_check_results: " +
      s"${spark.read.parquet(s"$wh/dq_check_results").count()} rows")
    (dims.map(_._1) :+ "fact").foreach { t =>
      println(s"[runner] $t: ${graft.io.AtomicPublish.read(spark, starBase, t).count()} rows")
    }
    val summary = results.filter(col("check_type") === "summary")
      .select("error_message").head().getString(0)
    println(s"[runner] DQ summary: $summary")
  }
}
