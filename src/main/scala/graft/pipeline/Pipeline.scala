package graft.pipeline

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Composition root for the medallion pipeline: bronze → silver (default
  * reference ETL window, `01_init_all.sql:64-65`) → star. Shared by the
  * driver contract (SparkEntry), the DQ suite, and the dashboard.
  */
object Pipeline {
  val defaultStart: LocalDate = LocalDate.parse("2023-01-01")
  val defaultEnd: LocalDate = LocalDate.parse("2023-12-31")

  val windowSql: String =
    " AND effective_from >= DATE '2023-01-01' AND effective_to <= DATE '2023-12-31'"

  def silver(spark: SparkSession, dir: String): DataFrame =
    Silver.cleanse(Bronze(spark, dir), Some(defaultStart), Some(defaultEnd))

  /** Memoized persisted silver — the medallion materialization point. The
    * star build fans out into 4 dims + the fact over the same frame, and
    * several registered queries (dims, fact, dq_checks) start from it;
    * without the session-scoped memo each consumer re-derives silver ←
    * bronze ← the orders⋈lineitem shuffle join. At cluster scale the
    * equivalent is writing silver to date-partitioned parquet
    * (graft.io.WindowReload, as PipelineRunner does).
    */
  def silverCached(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "silver", dir, "silver")(silver(spark, dir))

  def fact(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "fact", dir, "fact")(Star.fact(silverCached(spark, dir)))

  /** Oracle prefix: bronze + windowed silver CTEs. */
  val silverPrefix: String =
    "WITH " + Bronze.sqlCte + ", " + Silver.sqlCte(windowSql)

  /** Oracle prefix: bronze + windowed silver + star CTEs. */
  val starPrefix: String = silverPrefix + ", " + Star.sqlCte
}
