package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Pipeline, Star}

class StarSpec extends SparkSpec {
  import spark.implicits._

  private lazy val silver = Pipeline.silver(spark, sf0001).cache()

  test("dims have unique non-null natural keys and dense ids from 1") {
    for ((dim, nk, id) <- Seq(
      (Star.dimCustomer(silver), "customer_name", "customer_id"),
      (Star.dimProduct(silver), "product_category", "product_id"),
      (Star.dimRegion(silver), "region_name", "region_id"),
      (Star.dimStatus(silver), "status_name", "status_id"))) {
      val n = dim.count()
      assert(dim.filter(col(nk).isNull).count() === 0)
      assert(dim.select(nk).distinct().count() === n)
      assert(dim.agg(min(col(id)), max(col(id))).as[(Long, Long)].head() === ((1L, n)))
    }
  }

  test("upsertDim preserves existing ids and appends only new keys (M2)") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k_id", "k")
    val incoming = Seq("b", "c", "a", "d", "c").toDF("k")
    val merged = Star.upsertDim(existing, incoming, "k_id", "k")
      .as[(Long, String)].collect().toMap

    assert(merged === Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    // rerun with the merged dim is a no-op (grow-only idempotence)
    val again = Star.upsertDim(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k_id", "k"),
      incoming, "k_id", "k").as[(Long, String)].collect().toMap
    assert(again === Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("upsertDim drops NULL incoming keys (reference NOT NULL constraint)") {
    val existing = Seq((1L, "a")).toDF("k_id", "k")
    val incoming = Seq(Some("b"), None, Some("a")).toDF("k")
    val merged = Star.upsertDim(existing, incoming, "k_id", "k")
      .as[(Long, String)].collect().toMap
    assert(merged === Map(1L -> "a", 2L -> "b"))
  }

  test("fact resolves surrogate keys; NULL natural key leaves NULL fk (J1)") {
    val fact = Star.fact(silver).cache()
    assert(fact.count() === silver.count())
    // every non-null user_name resolves
    val unresolved = fact.filter(col("customer_id").isNull).count()
    val nullNames = silver.filter(col("user_name").isNull).count()
    assert(unresolved === nullNames)
  }
}
