package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{Bronze, Pipeline, Scd2, Star}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over a scale-factor directory, paired (in [[oracleSql]])
  * with ANSI SQL that DuckDB runs over the *same* parquet tables — the
  * driver hash-compares the two results (columns sorted by name).
  */
object SparkEntry {

  /** Flagship query: the full bronze→silver→star fact chain.
    * Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.fact(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Every query is
    * wrapped in [[Parity.doublify]] so no DECIMAL column ever reaches the
    * driver's comparator (see Parity.scala for why); the matching oracles
    * cast the same columns to DOUBLE in their outermost SELECT.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (pipelineQueries ++ graft.dq.DqQueries.queries ++ graft.ops.OpsQueries.queries)
      .map { case (name, f) =>
        name -> ((s: SparkSession, dir: String) => Parity.doublify(f(s, dir)))
      }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    pipelineOracles ++ graft.dq.DqQueries.oracles ++ graft.ops.OpsQueries.oracles

  private def pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bronze" -> ((s, dir) => Bronze(s, dir)),
    "silver" -> ((s, dir) => Pipeline.silverCached(s, dir)),
    "dim_customer" -> ((s, dir) => Star.dimCustomer(Pipeline.silverCached(s, dir))),
    "dim_product" -> ((s, dir) => Star.dimProduct(Pipeline.silverCached(s, dir))),
    "dim_region" -> ((s, dir) => Star.dimRegion(Pipeline.silverCached(s, dir))),
    "dim_status" -> ((s, dir) => Star.dimStatus(Pipeline.silverCached(s, dir))),
    // M2 grow-only upsert driven end-to-end: window-1 dim + window-2 keys
    "dim_customer_incremental" -> ((s, dir) =>
      Star.dimCustomerIncremental(Pipeline.silverCached(s, dir))),
    // SCD2 versioned-dimension merge (the schema's effective_from/to +
    // current_flag semantics, exercised H1→H2)
    "scd2_users" -> ((s, dir) => Scd2.userHistory(s, dir)),
    // S9 catalog: per-dataset row counts + actual-vs-declared schema
    "catalog_tables" -> ((s, dir) => Catalog.tablesReport(s, dir)),
    "fact" -> ((s, dir) => Pipeline.fact(s, dir)),
    // F14: string extraction — user number out of the 'user_NNNN' id
    "bronze_users" -> ((s, dir) =>
      Bronze(s, dir)
        .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
        .select(org.apache.spark.sql.functions.col("user_id"))
        .distinct()
        .withColumn("user_num",
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("user_id"), "_")
            .getItem(1).cast("int"))),
    // write-path proofs (M1/M3/S5/S7/S8): reload/migrate into a temp
    // target, re-read, compare against the ordinary read-side oracle
    "silver_reloaded" -> ((s, dir) => graft.io.ReloadChecks.silverReloaded(s, dir)),
    "dq_reloaded" -> ((s, dir) => graft.io.ReloadChecks.dqReloaded(s, dir)),
    "export_reconcile" -> ((s, dir) => graft.io.ReloadChecks.exportReconcile(s, dir)),
    // compliance delete: rewrite-purge a user set, audit FROM the
    // reloaded files (per-user deleted counts + purged flag)
    "purge_users" -> ((s, dir) => graft.io.ReloadChecks.purgeUsers(s, dir)),
    // atomic star publish (one manifest swap for dims + fact) under a
    // fixed audit clock; fact read back through the committed manifest
    "star_publish" -> ((s, dir) => graft.io.ReloadChecks.starPublish(s, dir))
  )

  // `* REPLACE`: DuckDB's project-all-but-recast — the salary/purchase
  // DECIMAL(15,2) accumulation columns become DOUBLE at the output edge,
  // matching Parity.doublify on the Spark side.
  private val moneyToDouble =
    "* REPLACE (CAST(salary AS DOUBLE) AS salary, CAST(purchase_amount AS DOUBLE) AS purchase_amount)"

  private def pipelineOracles: Map[String, String] = Map(
    "bronze" -> ("WITH " + Bronze.sqlCte + s" SELECT $moneyToDouble FROM bronze"),
    "silver" -> (Pipeline.silverPrefix + s" SELECT $moneyToDouble FROM silver"),
    "dim_customer" -> (Pipeline.starPrefix + " SELECT * FROM dim_customer"),
    "dim_product" -> (Pipeline.starPrefix + " SELECT * FROM dim_product"),
    "dim_region" -> (Pipeline.starPrefix + " SELECT * FROM dim_region"),
    "dim_status" -> (Pipeline.starPrefix + " SELECT * FROM dim_status"),
    "dim_customer_incremental" ->
      (Pipeline.silverPrefix + ", " + Star.dimCustomerIncrementalSql()),
    "scd2_users" -> Scd2.userHistorySql,
    "catalog_tables" -> Catalog.tablesReportSql,
    "fact" -> (Pipeline.starPrefix + s" SELECT $moneyToDouble FROM fact"),
    "bronze_users" -> ("WITH " + Bronze.sqlCte +
      """ SELECT user_id, CAST(string_split(user_id, '_')[2] AS INT) AS user_num
        | FROM (SELECT DISTINCT user_id FROM bronze WHERE user_id IS NOT NULL)""".stripMargin),
    // the write path must be lossless + idempotent → same oracles as the
    // read side (plus the constant run_date / the count reconciliation)
    "silver_reloaded" -> (Pipeline.silverPrefix + s" SELECT $moneyToDouble FROM silver"),
    "dq_reloaded" -> (Pipeline.starPrefix + ", " + graft.dq.DqSuite.sqlCte +
      " SELECT *, DATE '2024-01-15' AS run_date FROM dq_checks"),
    "export_reconcile" -> (Pipeline.starPrefix +
      """ SELECT CAST(count(*) AS BIGINT) AS staged_rows,
        |        CAST(count(*) AS BIGINT) AS loaded_rows,
        |        TRUE AS reconciled
        | FROM fact""".stripMargin),
    "purge_users" -> graft.io.ReloadChecks.purgeUsersSql,
    // the published fact must equal the read-side fact oracle with the
    // pinned clock's created_dt (F13 flips from partial to oracle-able)
    "star_publish" -> (Pipeline.starPrefix +
      s" SELECT $moneyToDouble, DATE '2024-01-15' AS created_dt FROM fact")
  )
}
