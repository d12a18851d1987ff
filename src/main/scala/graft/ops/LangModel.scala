package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** N-gram language-model scoring — the CCNet/KenLM-style perplexity
  * filter: train a bigram model with stupid backoff (Brants et al.,
  * EMNLP'07 §3) on the corpus's own train split, then score EVERY
  * document by mean log-probability / perplexity. Low-probability
  * documents are the noise/boilerplate candidates a pretraining pipeline
  * down-weights or drops.
  *
  * Training on the `train` hash split (the same [[Sampling.splitCol]]
  * assignment the leakage audit uses) rather than the full corpus keeps
  * the score honest for held-out text AND exercises the backoff path:
  * val/test documents contain bigrams the model never saw, which fall
  * back to `alpha · P_unigram(cur)` with add-one smoothing over the
  * train vocabulary (+1 OOV class).
  *
  * Scale shape: two count aggregations over the train split (unigram,
  * bigram — both map-side combined), then the scoring stream joins them
  * on their natural keys. The bigram count table is corpus-sized, so
  * that join stays a shuffle join on (prev, cur); the unigram table is
  * vocabulary-sized and AQE will broadcast it when it fits. Bigrams are
  * produced by array slicing inside the row (zip_with over two slices) —
  * no per-document window, no self-join, no extra shuffle to form pairs.
  */
object LangModel {

  private def wsCol: Column = split(TextMetrics.normalized(col("text")), " ")

  /** (doc_id, prev, cur) bigram stream, built narrow via array ops. */
  private def docBigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), wsCol.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => struct(a.as("prev"), b.as("cur")))).as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))

  /** Per-document LM score: bigram count, unseen-bigram count, mean log
    * stupid-backoff probability, and perplexity.
    */
  def score(spark: SparkSession, dir: String,
            alpha: Double = 0.4, salt: String = "split1"): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val train = docs.filter(Sampling.splitCol(col("doc_id"), salt) === "train")
    val uni = train
      .select(explode(wsCol).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("uc"))
    val totals = uni.agg(
      sum("uc").cast("double").as("n_tokens"),
      count(lit(1)).cast("double").as("vocab"))
    val bi = docBigrams(train).groupBy("prev", "cur").agg(count(lit(1)).as("bc"))

    val stream = docBigrams(docs)
      .join(bi, Seq("prev", "cur"), "left")
      .join(uni.select(col("token").as("prev"), col("uc").as("pc")), Seq("prev"), "left")
      .join(uni.select(col("token").as("cur"), col("uc").as("cc")), Seq("cur"), "left")
      .crossJoin(Bcast.ifBounded(totals, Bcast.OneRow))

    // seen bigram: conditional MLE count(prev,cur)/count(prev);
    // unseen: alpha · smoothed unigram (add-one over train vocab + OOV)
    val pUni = (coalesce(col("cc"), lit(0L)).cast("double") + 1.0) /
      (col("n_tokens") + col("vocab") + 1.0)
    val s = when(col("bc").isNotNull,
      col("bc").cast("double") / col("pc").cast("double"))
      .otherwise(lit(alpha) * pUni)

    stream.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"),
      sum(when(col("bc").isNull, 1L).otherwise(0L)).as("oov_bigrams"),
      avg(log(s)).cast("decimal(18,6)").as("avg_logprob"),
      exp(-avg(log(s))).cast("decimal(18,6)").as("ppl"))
  }

  def scoreSql(alpha: Double = 0.4, salt: String = "split1"): String = {
    val u = s"CAST(CAST('0x' || substr(md5('$salt' || ':' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0"
    s"""WITH ws AS (
       |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents
       |), tr AS (
       |  SELECT * FROM ws WHERE $u < 0.9
       |), uni AS (
       |  SELECT token, COUNT(*) AS uc
       |  FROM (SELECT unnest(ws) AS token FROM tr)
       |  WHERE length(token) > 0 GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(uc) AS DOUBLE) AS n_tokens, CAST(COUNT(*) AS DOUBLE) AS vocab FROM uni
       |), bi AS (
       |  SELECT prev, cur, COUNT(*) AS bc
       |  FROM (SELECT ws[i.i] AS prev, ws[i.i+1] AS cur
       |        FROM tr CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) i
       |        WHERE len(ws) >= 2)
       |  GROUP BY 1, 2
       |), db AS (
       |  SELECT doc_id, ws[i.i] AS prev, ws[i.i+1] AS cur
       |  FROM ws CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) i
       |  WHERE len(ws) >= 2
       |), sc AS (
       |  SELECT db.doc_id,
       |    CASE WHEN bi.bc IS NOT NULL
       |         THEN CAST(bi.bc AS DOUBLE) / CAST(p.uc AS DOUBLE)
       |         ELSE $alpha * ((CAST(COALESCE(c.uc, 0) AS DOUBLE) + 1.0)
       |                        / (tot.n_tokens + tot.vocab + 1.0)) END AS s,
       |    CASE WHEN bi.bc IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM db
       |  LEFT JOIN bi USING (prev, cur)
       |  LEFT JOIN uni p ON db.prev = p.token
       |  LEFT JOIN uni c ON db.cur = c.token
       |  CROSS JOIN tot
       |)
       |SELECT doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(oov) AS BIGINT) AS oov_bigrams,
       |  CAST(CAST(AVG(ln(s)) AS DECIMAL(18,6)) AS DOUBLE) AS avg_logprob,
       |  CAST(CAST(exp(-AVG(ln(s))) AS DECIMAL(18,6)) AS DOUBLE) AS ppl
       |FROM sc GROUP BY 1""".stripMargin
  }
}
