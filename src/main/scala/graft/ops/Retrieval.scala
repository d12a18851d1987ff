package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: BM25 lexical top-k fused with dense-vector top-k by
  * reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09 —
  * public technique; the standard first stage of a RAG pipeline, where
  * keyword recall and semantic recall fail on DIFFERENT queries and the
  * rank-level fusion needs no score calibration between the two systems).
  *
  * The two legs are the engine's own proven stacks end-to-end:
  *  - lexical: [[TextPrep.bm25]] over the query terms (inverted-index
  *    shape — only query-term postings shuffle);
  *  - dense: cosine against [[Featurize]]'s derived document vectors,
  *    with the QUERY text featurized by the same public hashing-trick
  *    scheme. The query vector is a driver-side constant (a handful of
  *    md5s), so the corpus side is ONE narrow projection + a distributed
  *    top-k (`orderBy(...).limit(k)` = TakeOrdered, never a global
  *    sort) — the same marginal cost as one more scan. At production
  *    query volume the dense leg swaps to the IVF-PQ index path proven
  *    by `ivfpq_topk_derived`; brute force is exact and is the point
  *    here (the fusion, not the index, is under test).
  *
  * Fusion: rrf(d) = Σ_legs 1/(60 + rank_leg(d)) over the union of both
  * top-k lists, missing legs contributing 0 (rank columns report 0 for
  * "not retrieved by this leg"). Both ranks are integers, so the score
  * is a sum of two exactly-representable rationals in a FIXED order —
  * deterministic across engines with no decimal grid needed.
  */
object Retrieval {

  /** The benchmark query: the same terms [[TextPrep.bm25]] registers. */
  val QueryText: String = TextPrep.Bm25Terms.mkString(" ")

  /** RRF dampening constant (k=60 — the value the RRF paper fixed and
    * everyone since has kept).
    */
  val RrfK: Int = 60

  /** Unit-normalized hashing-trick vector of `text`, computed on the
    * driver with the exact arithmetic of [[Featurize.vectorize]]
    * (bucket = first two md5 hex chars mod dim, sign = third hex char;
    * unigrams + adjacent bigrams). A query is a few tokens — this is a
    * handful of md5 calls, not a job.
    */
  def featurizeText(text: String): IndexedSeq[Double] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toIndexedSeq
    val grams = toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"${a}_$b" }
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw = new Array[Double](Featurize.dim)
    grams.foreach { g =>
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val b = Integer.parseInt(hex.substring(0, 2), 16) % Featurize.dim
      val s = if ("01234567".contains(hex.charAt(2))) 1.0 else -1.0
      raw(b) += s
    }
    val norm = math.sqrt(raw.map(x => x * x).sum)
    require(norm > 0, s"query text '$text' yields no grams")
    raw.map(_ / norm).toIndexedSeq
  }

  /** Fused top-`k`: (doc_id, rank_lex, rank_vec, rrf_score), ranks 0 when
    * the leg did not retrieve the document, ordered by the fused score.
    */
  def hybridRrf(spark: SparkSession, dir: String, k: Int = 10,
                legK: Int = 20): DataFrame = {
    val qv = featurizeText(QueryText)

    val lex = TextPrep.bm25(spark, dir, k = legK)
      .withColumn("rank_lex", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select("doc_id", "rank_lex")

    val qvLit = array(qv.map(lit): _*)
    val cos = (Similarity.dot(qvLit, col("v")) / col("norm"))
      .cast("decimal(10,6)")
    val vec = Featurize.vectors(spark, dir)
      .select(col("vec_id").as("doc_id"), cos.as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(legK)
      .withColumn("rank_vec", row_number().over(
        Window.orderBy(col("cosine").desc, col("doc_id"))))
      .select("doc_id", "rank_vec")

    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rank_lex"), lit(0)).as("rank_lex"),
        coalesce(col("rank_vec"), lit(0)).as("rank_vec"))
      .withColumn("rrf_score",
        coalesce(when(col("rank_lex") > 0,
          lit(1.0) / (lit(RrfK) + col("rank_lex"))), lit(0.0)) +
        coalesce(when(col("rank_vec") > 0,
          lit(1.0) / (lit(RrfK) + col("rank_vec"))), lit(0.0)))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(k)
  }

  /** Oracle: both legs and the fusion replayed in SQL — the bm25 CTE is
    * the registered lexical oracle, the dense leg dots the SAME literal
    * query vector against the [[Featurize.embCteAs]] derived vectors.
    */
  def hybridRrfSql(k: Int = 10, legK: Int = 20): String = {
    val qv = featurizeText(QueryText)
    val qvSql = qv.mkString("[", ", ", "]")
    s"""WITH ${Featurize.embCteAs("femb")},
       |lexb AS (
       |  ${TextPrep.bm25Sql(k = legK).replace("\n", "\n  ")}
       |), lex AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank_lex
       |  FROM lexb
       |), vecb AS (
       |  SELECT vec_id AS doc_id,
       |         CAST(list_dot_product($qvSql, v) / norm AS DECIMAL(10,6)) AS cosine
       |  FROM femb
       |  ORDER BY cosine DESC, vec_id LIMIT $legK
       |), vec AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS rank_vec
       |  FROM vecb
       |), fused AS (
       |  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
       |         COALESCE(rank_lex, 0) AS rank_lex,
       |         COALESCE(rank_vec, 0) AS rank_vec,
       |         COALESCE(CASE WHEN rank_lex > 0
       |                  THEN CAST(1.0 AS DOUBLE) / (${RrfK} + rank_lex) END,
       |                  CAST(0.0 AS DOUBLE))
       |         + COALESCE(CASE WHEN rank_vec > 0
       |                    THEN CAST(1.0 AS DOUBLE) / (${RrfK} + rank_vec) END,
       |                    CAST(0.0 AS DOUBLE)) AS rrf_score
       |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
       |)
       |SELECT doc_id, rank_lex, rank_vec, rrf_score
       |FROM fused ORDER BY rrf_score DESC, doc_id LIMIT $k""".stripMargin
  }
}
