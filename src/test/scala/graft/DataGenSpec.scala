package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{DataGen, Silver}

class DataGenSpec extends SparkSpec {

  private lazy val df = DataGen.users(spark, 20000).cache()

  test("deterministic under a fixed seed") {
    val a = DataGen.users(spark, 100).collect()
    val b = DataGen.users(spark, 100).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("anomaly rates near the reference's (5/3/4/2/3 percent)") {
    val n = df.count().toDouble
    def rate(c: org.apache.spark.sql.Column): Double = df.filter(c).count() / n
    assert(math.abs(rate(col("salary") < 0) - 0.05) < 0.01)
    assert(math.abs(rate(col("age").isNull) - 0.03) < 0.01)
    assert(math.abs(rate(col("effective_to") < col("effective_from")) - 0.04) < 0.01)
    assert(math.abs(rate(col("product_category") === "Invalid_Category") - 0.03) < 0.01)
  }

  test("vocabulary sizes match the reference (100/5/5/3)") {
    assert(df.select("user_id").distinct().count() === 100)
    assert(df.filter(col("product_category") =!= "Invalid_Category")
      .select("product_category").distinct().count() === 5)
    assert(df.select("region").distinct().count() === 5)
    assert(df.select("customer_status").distinct().count() === 3)
  }

  test("duplicate injection adds ~2% rows") {
    val base = DataGen.users(spark, 20000).count()
    val withDups = DataGen.withDuplicates(spark, 20000).count()
    val rate = (withDups - base).toDouble / base
    assert(math.abs(rate - 0.02) < 0.01, s"dup rate $rate")
  }

  test("clip + null round-trip (S3/F15/F16 quirks)") {
    val c = DataGen.clipped(df)
    assert(c.filter(col("age") < 0 || col("age") > 120).count() === 0)
    assert(c.filter(col("purchase_amount") > 1000000).count() === 0)
    // fillna(0).replace(0, None): no zeros survive, NULLs exist
    assert(c.filter(col("transaction_count") === 0).count() === 0)
    assert(c.filter(col("transaction_count").isNull).count() > 0)
  }

  test("generated data flows through the silver cleanse") {
    val silver = Silver.cleanse(df.limit(5000))
    assert(silver.filter(col("salary") < 0).count() === 0)
    assert(silver.filter(col("effective_to") < col("effective_from")).count() === 0)
  }
}
