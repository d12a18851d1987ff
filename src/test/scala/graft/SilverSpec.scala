package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Pipeline, Silver}

/** The silver DQ invariants of the reference's pytest suite
  * (`/root/reference/tests/test_etl.py:105-131`) plus the CHECK
  * constraints of the structured table (`01_init_all.sql:25-38`).
  */
class SilverSpec extends SparkSpec {

  private lazy val silver = Pipeline.silver(spark, sf0001).cache()

  test("silver is non-empty") {
    assert(silver.count() > 0)
  }

  test("no negative salaries (test_etl.py:108-112)") {
    assert(silver.filter(col("salary") < 0).count() === 0)
  }

  test("age within [18, 100] (test_etl.py:114-120)") {
    assert(silver.filter(col("age") < 18 || col("age") > 100).count() === 0)
  }

  test("effective_to >= effective_from (test_etl.py:122-128)") {
    assert(silver.filter(col("effective_to") < col("effective_from")).count() === 0)
  }

  test("user_id NOT NULL gate (01_init_all.sql:25,134)") {
    assert(silver.filter(col("user_id").isNull).count() === 0)
  }

  test("purchase_amount within [0, 100000] (01_init_all.sql:29)") {
    assert(silver.filter(col("purchase_amount") < 0 || col("purchase_amount") > 100000).count() === 0)
  }

  test("transaction_count within [0, 1000] (01_init_all.sql:33)") {
    assert(silver.filter(col("transaction_count") < 0 || col("transaction_count") > 1000).count() === 0)
  }

  test("category in allowed set or Other; NULL passes through (01_init_all.sql:30,103-107)") {
    val allowed = Silver.categories :+ "Other"
    assert(silver.filter(col("product_category").isNotNull &&
      !col("product_category").isin(allowed: _*)).count() === 0)
    // the null-propagating NOT IN quirk: NULL category must NOT become 'Other'
    assert(silver.filter(col("product_category").isNull).count() > 0)
  }

  test("customer_status lowercased with 'unknown' default (01_init_all.sql:110-113)") {
    assert(silver.filter(col("customer_status").isNull).count() === 0)
    assert(silver.filter(col("customer_status") =!= lower(col("customer_status"))).count() === 0)
  }

  test("dates inside the load window (P2)") {
    assert(silver.filter(col("effective_from") < lit("2023-01-01").cast("date")).count() === 0)
  }
}
