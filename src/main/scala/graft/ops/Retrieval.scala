package graft.ops

import graft.Bcast

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
      .grid6
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
       |         floor((list_dot_product($qvSql, v) / norm) * 1e6 + 0.5) / 1e6 AS cosine
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

  /** Fixed per-rank metric constants, 9-dp decimals computed once on the
    * driver and injected into BOTH engines — rank-level lookups instead
    * of per-engine transcendental math (`1/log2(r+1)` evaluated by two
    * different libm implementations can differ in the last ulp; a shared
    * literal table cannot).
    */
  private def rrConst(r: Int): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(1.0 / r).setScale(9, java.math.RoundingMode.HALF_UP)
  private def ndcgConst(r: Int): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(math.log(2) / math.log(r + 1.0))
      .setScale(9, java.math.RoundingMode.HALF_UP)

  /** Batch known-item retrieval evaluation — the harness every retrieval
    * stack is tuned against: a fixed panel of queries (an 8-token slice
    * of each panel document's own text), BM25-scored against the whole
    * corpus in ONE multi-query pass, and the panel document itself is
    * the known relevant item. Reports hits@1 / hits@k / MRR / nDCG@k
    * over the panel.
    *
    * The panel is a FIXED arithmetic subset (`doc_id % 19 == 3` below
    * id 500 — same count at every corpus size): evaluation query volume
    * is a property of the harness, not the corpus, so the operator's
    * cost scales with postings × a constant, not corpus².
    *
    * Scale: the corpus token stream shuffles once into (doc, token)
    * counts restricted to the panel's term set (semi-join pushdown);
    * scoring is a hash join of those postings against the panel terms;
    * the per-query ranking window partitions by query over
    * posting-bounded candidates. (This synthetic corpus's ~50-word
    * vocabulary makes every doc a candidate for every query — a Zipfian
    * real corpus with WAND-style posting pruning bounds candidates far
    * tighter; the plan shape is the same.) Per-query metric values come
    * from the shared literal table, summed as exact decimals — no
    * accumulation-order dependence.
    */
  def knownItemEval(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val nDocs = docs.count()
    val toks = docs
      .select(col("doc_id"),
        explode(split(TextMetrics.normalized(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val avgdl = toks.count().toDouble / nDocs

    val panel = docs.filter(col("doc_id") % 19 === 3 && col("doc_id") < 500)
    val qterms = panel
      .select(col("doc_id").as("query_id"),
        explode(slice(split(TextMetrics.normalized(col("text")), " "), 3, 8))
          .as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
    val needed = qterms.select("token").distinct()

    val tf = toks.join(Bcast.ifBounded(needed, Bcast.QueryBatch), "token")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("doc_len"))

    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val tfD = col("tf").cast("double")
    val contrib = (idf * tfD * (lit(1.2) + 1.0) /
      (tfD + lit(1.2) * (lit(1.0) - 0.75 +
        lit(0.75) * col("doc_len").cast("double") / avgdl)))
      .cast("decimal(18,6)")

    val scored = qterms
      .join(tf, "token")
      .join(Bcast.ifBounded(dfreq, Bcast.QueryBatch), "token")
      .join(lens, "doc_id")
      .select(col("query_id"), col("doc_id"), contrib.as("c"))
      .groupBy("query_id", "doc_id").agg(sum("c").as("score_dec"))
    val ranked = scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score_dec").desc, col("doc_id"))))
      .filter(col("rank") <= k)

    val rel = ranked.filter(col("doc_id") === col("query_id"))
      .select(col("query_id"), col("rank").as("rel_rank"))
    val perQuery = panel.select(col("doc_id").as("query_id"))
      .join(rel, Seq("query_id"), "left")

    val rrCase = (1 to k).foldLeft(lit(java.math.BigDecimal.ZERO)
      .cast("decimal(18,9)")) { (acc, r) =>
      when(col("rel_rank") === r, lit(rrConst(r))).otherwise(acc)
    }
    val ndcgCase = (1 to k).foldLeft(lit(java.math.BigDecimal.ZERO)
      .cast("decimal(18,9)")) { (acc, r) =>
      when(col("rel_rank") === r, lit(ndcgConst(r))).otherwise(acc)
    }
    perQuery
      .select(col("query_id"), rrCase.as("rr"), ndcgCase.as("ndcg"))
      .agg(
        count(lit(1)).as("n_queries"),
        count(when(col("rr") === lit(rrConst(1)), 1)).as("hits_at1"),
        count(when(col("rr") > 0, 1)).as(s"hits_at$k"),
        (sum("rr").cast("double") / count(lit(1))).as("mrr"),
        (sum("ndcg").cast("double") / count(lit(1))).as(s"ndcg$k"))
  }

  def knownItemEvalSql(k: Int = 10): String = {
    val rrWhen = (1 to k)
      .map(r => s"WHEN $r THEN CAST('${rrConst(r)}' AS DECIMAL(18,9))")
      .mkString("\n         ")
    val ndcgWhen = (1 to k)
      .map(r => s"WHEN $r THEN CAST('${ndcgConst(r)}' AS DECIMAL(18,9))")
      .mkString("\n         ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS token
       |  FROM documents
       |), ftoks AS (
       |  SELECT * FROM toks WHERE length(token) > 0
       |), consts AS (
       |  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM ftoks)
       |           / (SELECT COUNT(*) FROM documents) AS avgdl,
       |         (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n
       |), qterms AS (
       |  SELECT DISTINCT doc_id AS query_id, t.token
       |  FROM documents,
       |       unnest(list_slice(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '), 3, 10)) t(token)
       |  WHERE doc_id % 19 = 3 AND doc_id < 500 AND length(t.token) > 0
       |), tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf FROM ftoks
       |  WHERE token IN (SELECT DISTINCT token FROM qterms) GROUP BY 1, 2
       |), dfreq AS (
       |  SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1
       |), lens AS (
       |  SELECT doc_id, COUNT(*) AS doc_len FROM ftoks GROUP BY 1
       |), scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |         SUM(CAST(ln(1.0 + (n - df + 0.5) / (df + 0.5))
       |              * CAST(tf AS DOUBLE) * (1.2 + 1.0)
       |              / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75
       |                   + 0.75 * CAST(doc_len AS DOUBLE) / avgdl))
       |              AS DECIMAL(18,6))) AS score_dec
       |  FROM qterms q
       |  JOIN tf USING (token) JOIN dfreq USING (token)
       |  JOIN lens ON lens.doc_id = tf.doc_id, consts
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT query_id, doc_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score_dec DESC, doc_id) AS rank
       |  FROM scored
       |), rel AS (
       |  SELECT query_id, rank AS rel_rank FROM ranked
       |  WHERE rank <= $k AND doc_id = query_id
       |), per_query AS (
       |  SELECT p.query_id,
       |         COALESCE(CASE rel_rank
       |         $rrWhen
       |         END, CAST(0 AS DECIMAL(18,9))) AS rr,
       |         COALESCE(CASE rel_rank
       |         $ndcgWhen
       |         END, CAST(0 AS DECIMAL(18,9))) AS ndcg
       |  FROM (SELECT DISTINCT query_id FROM qterms) p
       |  LEFT JOIN rel USING (query_id)
       |)
       |SELECT COUNT(*) AS n_queries,
       |       COUNT(CASE WHEN rr = CAST('${rrConst(1)}' AS DECIMAL(18,9))
       |                  THEN 1 END) AS hits_at1,
       |       COUNT(CASE WHEN rr > 0 THEN 1 END) AS hits_at$k,
       |       CAST(SUM(rr) AS DOUBLE) / COUNT(*) AS mrr,
       |       CAST(SUM(ndcg) AS DOUBLE) / COUNT(*) AS ndcg$k
       |FROM per_query""".stripMargin
  }
}
