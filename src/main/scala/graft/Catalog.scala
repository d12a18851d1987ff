package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S9 — the reference's idempotent DDL bootstrap
  * (`/root/reference/data-pipeline/src/init_database.py:20-371`,
  * `sql/init/01_init_all.sql`): declared schemas for every layer plus
  * view registration. Spark has no CHECK constraints — those live in
  * BronzeIngest (ingest split) and DqSuite (runtime checks); what a
  * catalog contributes here is (a) authoritative `StructType`s to
  * validate/align frames against and (b) temp-view registration so the
  * whole pipeline is queryable by name via `spark.sql`.
  */
object Catalog {

  /** `t_sql_source_unstructured` (`01_init_all.sql:5-20`). */
  val bronzeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", StringType, nullable = true),
    StructField("user_name", StringType, nullable = true),
    StructField("age", IntegerType, nullable = true),
    StructField("salary", DecimalType(15, 2), nullable = true),
    StructField("purchase_amount", DecimalType(15, 2), nullable = true),
    StructField("product_category", StringType, nullable = true),
    StructField("region", StringType, nullable = true),
    StructField("customer_status", StringType, nullable = true),
    StructField("transaction_count", IntegerType, nullable = true),
    StructField("effective_from", DateType, nullable = true),
    StructField("effective_to", DateType, nullable = true),
    StructField("current_flag", BooleanType, nullable = true)
  ))

  /** `t_sql_source_structured` (`01_init_all.sql:23-39`); NOT NULLs are
    * enforced by the silver transform, recorded here as nullable=false.
    */
  val silverSchema: StructType = StructType(bronzeSchema.fields.map {
    case f @ StructField("user_id", _, _, _) => f.copy(nullable = false)
    case f @ StructField("effective_from", _, _, _) => f.copy(nullable = false)
    case f @ StructField("effective_to", _, _, _) => f.copy(nullable = false)
    case f => f
  })

  /** `t_dm_task` (`t_dm_task.sql:1-15`). */
  val factSchema: StructType = StructType(Seq(
    StructField("fact_id", LongType, nullable = false),
    StructField("customer_id", LongType, nullable = true),
    StructField("product_id", LongType, nullable = true),
    StructField("region_id", LongType, nullable = true),
    StructField("status_id", LongType, nullable = true),
    StructField("age", IntegerType, nullable = true),
    StructField("salary", DecimalType(15, 2), nullable = true),
    StructField("purchase_amount", DecimalType(15, 2), nullable = true),
    StructField("transaction_count", IntegerType, nullable = true),
    StructField("effective_from", DateType, nullable = true),
    StructField("effective_to", DateType, nullable = true),
    StructField("current_flag", BooleanType, nullable = true)
  ))

  /** `t_dq_check_results` minus runtime columns (`t_dq_check_results.sql`). */
  val dqResultSchema: StructType = graft.dq.DqSuite.schema

  /** Check a frame structurally matches a declared schema (names + types
    * in order; nullability advisory). The bootstrap-time analog of the
    * reference's DDL guarantees.
    */
  def conforms(df: DataFrame, schema: StructType): Boolean =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq

  /** Register the whole pipeline as temp views — source tables by name,
    * medallion layers, and `v_dm_task` (the reference's view,
    * `init_database.py:351-368`). Idempotent like `CREATE OR REPLACE`.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    pipeline.Bronze(spark, dir).createOrReplaceTempView("t_sql_source_unstructured")
    val silver = pipeline.Pipeline.silverCached(spark, dir)
    silver.createOrReplaceTempView("t_sql_source_structured")
    pipeline.Star.dimCustomer(silver).createOrReplaceTempView("t_dim_customer")
    pipeline.Star.dimProduct(silver).createOrReplaceTempView("t_dim_product")
    pipeline.Star.dimRegion(silver).createOrReplaceTempView("t_dim_region")
    pipeline.Star.dimStatus(silver).createOrReplaceTempView("t_dim_status")
    pipeline.Pipeline.fact(spark, dir).createOrReplaceTempView("t_dm_task")
    spark.sql("SELECT * FROM t_dm_task").createOrReplaceTempView("v_dm_task")
  }
}
