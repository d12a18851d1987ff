package graft

import org.apache.spark.sql.functions._
import graft.ops.{Pq, Recall}

class PqSpec extends SparkSpec {

  test("every vector gets exactly one code per subspace, all within range") {
    val c = Pq.codes(spark, sf0001).cache()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(c.count() === n * Pq.numSub)
    assert(c.groupBy("vec_id").count().filter(col("count") =!= Pq.numSub).count() === 0)
    assert(c.filter(col("code") < 0 || col("code") >= Pq.numCodes).count() === 0)
  }

  test("codebooks: 8 subspaces x 16 codewords of subDim doubles") {
    val cb = Pq.codebooks(spark, sf0001).cache()
    assert(cb.count() === (Pq.numSub * Pq.numCodes).toLong)
    assert(cb.filter(size(col("cw")) =!= Pq.subDim).count() === 0)
  }

  test("ADC shortlist + exact rerank recovers what 4-bit codes lose") {
    val r = Recall.pqAtK(spark, sf0001)
      .filter(col("query_id") === -1L)
      .select("method", "recall").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    // pure ADC on a near-random corpus (PQ's worst case: no cluster
    // structure for the codebooks to exploit) — just assert it retrieves
    assert(r("pq") > 0.1)
    // the production shape: rerank the 100-candidate shortlist exactly
    assert(r("pq_rerank") >= 0.7)
    assert(r("pq_rerank") > r("pq") + 0.3)
    // the composed stack: IVF probes bound the scan, codes bound the
    // bytes, rerank restores precision — only pays the list restriction
    assert(r("ivfpq") >= 0.6)
  }
}
