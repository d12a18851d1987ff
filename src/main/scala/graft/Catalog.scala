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

  /** Catalog report — one row per registered dataset: name, row count,
    * and the ACTUAL Spark read schema rendered canonically
    * (`name:type,…`). The oracle carries the DECLARED schema as a
    * literal, so a drift in what Spark reads (a parquet type change, a
    * transform regression) fails the compare — the queryable analog of
    * the reference's DDL bootstrap guarantees (S9).
    */
  def tablesReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    datasets(spark, dir).map { case (name, df) =>
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(name).as("table_name"), col("n_rows"),
          lit(sig(df)).as("schema_sig"))
    }.reduce(_ unionByName _)
  }

  private def sig(df: DataFrame): String =
    df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")

  private val sourceNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  private def datasets(spark: SparkSession, dir: String): Seq[(String, DataFrame)] =
    sourceNames.map(t => t -> Tables(spark, dir, t)) ++ Seq(
      "events" -> Tables.events(spark, dir),
      "bronze" -> pipeline.Bronze(spark, dir),
      "silver" -> pipeline.Pipeline.silverCached(spark, dir),
      "fact" -> pipeline.Pipeline.fact(spark, dir))

  /** Declared schemas the oracle checks [[tablesReport]] against. */
  private val declaredSigs: Seq[(String, String)] = Seq(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string",
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double",
    "orders" -> "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string",
    "lineitem" -> "l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz",
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int",
    "events" -> "event_id:bigint,ts:timestamp,user_id:bigint,event_type:string,value:double,props:string",
    "bronze" -> "id:bigint,user_id:string,user_name:string,age:int,salary:decimal(15,2),purchase_amount:decimal(15,2),product_category:string,region:string,customer_status:string,transaction_count:int,effective_from:date,effective_to:date,current_flag:boolean",
    "silver" -> "id:bigint,user_id:string,user_name:string,age:int,salary:decimal(15,2),purchase_amount:decimal(15,2),product_category:string,region:string,customer_status:string,transaction_count:int,effective_from:date,effective_to:date,current_flag:boolean",
    "fact" -> "fact_id:bigint,customer_id:bigint,product_id:bigint,region_id:bigint,status_id:bigint,age:int,salary:decimal(15,2),purchase_amount:decimal(15,2),transaction_count:int,effective_from:date,effective_to:date,current_flag:boolean")

  /** DuckDB oracle for [[tablesReport]]: source counts come straight off
    * the parquet views; the derived layers' counts run the same CTE
    * chains their own read-side oracles use.
    */
  def tablesReportSql: String = {
    def derived(name: String): String = name match {
      case "bronze" => s"(WITH ${pipeline.Bronze.sqlCte} SELECT * FROM bronze)"
      case "silver" => s"(${pipeline.Pipeline.silverPrefix} SELECT * FROM silver)"
      case "fact"   => s"(${pipeline.Pipeline.starPrefix} SELECT * FROM fact)"
      case t        => t
    }
    declaredSigs.map { case (name, s) =>
      s"""SELECT '$name' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
         |       '$s' AS schema_sig FROM ${derived(name)}""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

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
