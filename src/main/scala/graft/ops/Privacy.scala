package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational privacy audits — the release-gate complement to the text-side
  * PII scan ([[Redact]]) and the deletion proof (`purge_users`): before a
  * table leaves the platform, measure whether quasi-identifier combinations
  * re-identify individuals (k-anonymity, Sweeney's model).
  *
  * Reference scope: the reference's DQ framework audits value ranges and
  * uniqueness (`sql/dds/s_sql_dds/function/fn_dq_checks_load.sql:121-156`)
  * but has no privacy surface; this extends the same
  * aggregate-and-threshold shape to equivalence-class size.
  */
object Privacy {

  /** k-anonymity audit over `customer` at two generalization levels.
    *
    * Level 0 keys the equivalence classes on the full quasi-identifier
    * set (market segment, nation, account-balance band of 1000); level 1
    * generalizes away the balance band — the ladder step a release
    * pipeline climbs until every class reaches size ≥ k. The output is
    * the class-size histogram per level with the at-risk marker
    * (size < k), i.e. exactly what the decision "publish, coarsen, or
    * suppress" reads.
    *
    * Scale: two hash aggregates over the table (class build, histogram) —
    * map-side combined, no window over raw rows; output is
    * histogram-sized. The class-size aggregate is the same shuffle a
    * production GROUP BY on the QI key would already pay.
    */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val cust = Tables.customer(spark, dir)
    def level(lvl: Int, keys: Seq[String]): DataFrame =
      cust
        .withColumn("bal_band",
          floor(col("c_acctbal") / 1000).cast("long"))
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("cls_size"))
        .groupBy("cls_size")
        .agg(count(lit(1)).as("n_classes"))
        .select(lit(lvl).as("level"), col("cls_size"), col("n_classes"),
          (col("cls_size") * col("n_classes")).as("n_rows"),
          (col("cls_size") < k).as("at_risk"))
    level(0, Seq("c_mktsegment", "c_nationkey", "bal_band"))
      .unionByName(level(1, Seq("c_mktsegment", "c_nationkey")))
  }

  def kAnonymitySql(k: Int = 5): String =
    s"""WITH banded AS (
       |  SELECT c_mktsegment, c_nationkey,
       |         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
       |  FROM customer
       |), cls0 AS (
       |  SELECT COUNT(*) AS cls_size FROM banded
       |  GROUP BY c_mktsegment, c_nationkey, bal_band
       |), cls1 AS (
       |  SELECT COUNT(*) AS cls_size FROM banded
       |  GROUP BY c_mktsegment, c_nationkey
       |)
       |SELECT CAST(0 AS INT) AS level, cls_size, COUNT(*) AS n_classes,
       |       cls_size * COUNT(*) AS n_rows, cls_size < $k AS at_risk
       |FROM cls0 GROUP BY cls_size
       |UNION ALL
       |SELECT CAST(1 AS INT), cls_size, COUNT(*),
       |       cls_size * COUNT(*), cls_size < $k
       |FROM cls1 GROUP BY cls_size""".stripMargin
}
