package graft

import org.apache.spark.sql.functions._
import graft.ops.{Featurize, Ivf, Pq, Similarity}

/** The engine-produced embedding path: hashing-trick featurizer
  * properties plus the derived-corpus retrieval stack (the oracle gate
  * proves bit-exactness vs DuckDB; these specs prove the SEMANTIC
  * properties an embedding must have to be useful).
  */
class FeaturizeSpec extends SparkSpec {

  test("featurized output is unit-norm per document") {
    val ss = Featurize.featurized(spark, sf0001)
      .groupBy("doc_id")
      .agg(sum(col("feature") * col("feature")).as("ss"))
    assert(ss.count() > 0)
    assert(ss.filter(abs(col("ss") - 1.0) > 1e-9).count() === 0)
  }

  test("similar texts land close, dissimilar texts far (cosine)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "copy1 the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely unrelated text about quantum chromodynamics lattice gauge simulations")
    ).toDF("id", "text")
    val v = Featurize.vectorize(docs, "text").select("id", "v", "norm")
    val pairs = v.as("a").crossJoin(v.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        (aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) /
          (col("a.norm") * col("b.norm"))).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) > 0.9, s"near-dup pair cosine ${pairs((0L, 1L))}")
    assert(pairs((0L, 2L)) < 0.5, s"unrelated pair cosine ${pairs((0L, 2L))}")
  }

  test("derived-corpus IVF assignment is total and lists are bounded") {
    val n = Featurize.vectors(spark, sf0001).count()
    val assign = Ivf.assignments(spark, sf0001, Featurize.corpus)
    assert(assign.count() === n, "every derived vector must be assigned")
    assert(assign.select("vec_id").distinct().count() === n)
  }

  test("derived IVF-PQ top-k returns k ranked neighbors per query") {
    val t = Pq.ivfPqTopK(spark, sf0001, corpus = Featurize.corpus)
    val perQuery = t.groupBy("query_id").agg(
      count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perQuery.count() > 0)
    assert(perQuery.filter(col("n") =!= 10 || col("mx") =!= 10).count() === 0)
  }
}
