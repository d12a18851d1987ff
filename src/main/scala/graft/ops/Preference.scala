package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Labeled-data / RLHF preparation operators: preference-pair
  * construction (chosen vs rejected per group) and annotator-agreement
  * QA (per-rater cards + Fleiss' kappa). These are the ops a
  * reward-model or instruction-tuning data pipeline runs between "we
  * have scored documents" and "we can train on them".
  *
  * Determinism: pair selection is a struct argmax/argmin (the house
  * [[Dedup.keepBest]] rule — no per-group sort window), with the
  * quality score bit-identical across engines (the `text_quality`
  * hash-green property) and doc_id tiebreaks; the synthetic raters are
  * salted-md5 hash draws ([[Sampling.hashUniform]]'s rule), so every
  * label is replayable in DuckDB; all agreement statistics come from
  * exact integer counts and land on the 6-dp decimal grid.
  */
object Preference {

  /** One preference pair per (source, lang) group with ≥ 2 documents:
    * `chosen` is the quality argmax (tie → lower doc_id), `rejected` the
    * argmin (tie → higher doc_id, so the pair is distinct even under
    * full ties), plus the quality margin. This is the "best vs worst of
    * the batch" pairing rule used to bootstrap preference data from a
    * scored-but-unranked corpus.
    *
    * Scale shape: one doc-grain quality projection (no shuffle), then a
    * single map-side-combined aggregate to the (source, lang) grain —
    * two struct min/max accumulators per group, never a rank window
    * over corpus-scale rows.
    */
  def pairs(spark: SparkSession, dir: String): DataFrame = {
    val q = TextMetrics.quality(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source", "lang"), "doc_id")
      .select(col("source"), col("lang"), col("doc_id"), col("quality_score").as("q"))
    q.groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        max(struct(col("q"), (-col("doc_id")).as("nid"))).as("best"),
        min(struct(col("q"), (-col("doc_id")).as("nid"))).as("worst"))
      .filter(col("n_docs") >= 2)
      .select(col("source"), col("lang"), col("n_docs"),
        (-col("best.nid")).as("chosen_doc"),
        (-col("worst.nid")).as("rejected_doc"),
        (col("best.q") - col("worst.q")).cast("decimal(18,6)").as("margin"))
  }

  def pairsSql: String =
    s"""WITH q0 AS (${TextMetrics.qualitySql}),
       |q AS (
       |  SELECT d.source, d.lang, q0.doc_id, q0.quality_score AS q
       |  FROM q0 JOIN documents d USING (doc_id)
       |), g AS (
       |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         MAX(ROW(q, -doc_id)) AS best,
       |         MIN(ROW(q, -doc_id)) AS worst
       |  FROM q GROUP BY 1, 2
       |)
       |SELECT source, lang, n_docs,
       |       CAST(-(best[2]) AS BIGINT) AS chosen_doc,
       |       CAST(-(worst[2]) AS BIGINT) AS rejected_doc,
       |       CAST(CAST(best[1] - worst[1] AS DECIMAL(18,6)) AS DOUBLE) AS margin
       |FROM g WHERE n_docs >= 2""".stripMargin

  /** Number of synthetic raters; public so the spec and oracle share it. */
  val nRaters = 3

  /** Per-rater labeling card + corpus-level agreement: each of
    * [[nRaters]] simulated annotators marks a document "good" with
    * probability 0.8 (long documents, ≥ 400 chars) or 0.2 (short) via
    * an independent salted hash draw — the standard noisy-rater model.
    * Output: one row per rater (labels issued, positive share, share
    * agreeing with the per-doc majority) with the shared observed
    * agreement, expected-by-chance agreement, and Fleiss' kappa
    * broadcast onto every row.
    *
    * Fleiss over 2 categories with r raters reduces to integers: per
    * doc with k positives, the agreeing-pair count is
    * `k·(k−1) + (r−k)·(r−k−1)`; the kappa is assembled from those sums
    * in one fixed expression. The majority label is well-defined for
    * odd r.
    *
    * Scale shape: the label table is docs × raters (a constant ×
    * corpus), built by exploding a literal rater array — no shuffle
    * until the doc-grain count aggregate (map-side combined); the
    * per-rater card is a second aggregate over the same frame, joined
    * to the doc-grain majorities on the already-partitioned doc key.
    */
  def raterAgreement(spark: SparkSession, dir: String, salt: String = "r1"): DataFrame = {
    val r = nRaters
    val u = conv(substring(md5(concat(lit(salt), lit("-"), col("rater").cast("string"),
      lit(":"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0
    val labels = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("n_chars") >= 400).as("long_doc"))
      .select(col("doc_id"), col("long_doc"),
        explode(array((1 to r).map(lit): _*)).as("rater"))
      .select(col("doc_id"), col("rater"),
        (u < when(col("long_doc"), 0.8).otherwise(0.2)).cast("int").as("pos"))
    val perDoc = labels.groupBy("doc_id").agg(
      sum("pos").as("k"), count(lit(1)).as("r"))
      .select(col("doc_id"), col("k"),
        (col("k") * 2 > col("r")).cast("int").as("majority"),
        (col("k") * (col("k") - 1) + (col("r") - col("k")) * (col("r") - col("k") - 1))
          .as("agree_pairs"))
    val totals = perDoc.agg(
      count(lit(1)).as("n_docs"), sum("k").as("sum_k"),
      sum("agree_pairs").as("sum_agree"))
    val pObs = col("sum_agree").cast("double") /
      (col("n_docs") * r * (r - 1)).cast("double")
    val p = col("sum_k").cast("double") / (col("n_docs") * r).cast("double")
    val pExp = p * p + (lit(1.0) - p) * (lit(1.0) - p)
    val stats = totals.select(
      pObs.cast("decimal(18,6)").as("p_obs"),
      pExp.cast("decimal(18,6)").as("p_exp"),
      ((pObs - pExp) / (lit(1.0) - pExp)).cast("decimal(18,6)").as("fleiss_kappa"))
    labels.join(perDoc.select("doc_id", "majority"), "doc_id")
      .groupBy("rater").agg(
        count(lit(1)).as("n_labels"),
        sum("pos").as("n_pos"),
        sum((col("pos") === col("majority")).cast("long")).as("n_major"))
      .crossJoin(Bcast.ifBounded(stats, Bcast.OneRow))
      .select(col("rater"), col("n_labels"),
        (col("n_pos").cast("double") / col("n_labels").cast("double"))
          .cast("decimal(18,6)").as("pos_share"),
        (col("n_major").cast("double") / col("n_labels").cast("double"))
          .cast("decimal(18,6)").as("majority_agree"),
        col("p_obs"), col("p_exp"), col("fleiss_kappa"))
  }

  def raterAgreementSql(salt: String = "r1"): String = {
    val r = nRaters
    val u = s"CAST(CAST('0x' || substr(md5('$salt' || '-' || CAST(rater AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0"
    s"""WITH labels AS (
       |  SELECT d.doc_id, r.rater,
       |         CAST($u < CASE WHEN d.n_chars >= 400 THEN 0.8 ELSE 0.2 END AS INT) AS pos
       |  FROM documents d
       |  CROSS JOIN (SELECT CAST(unnest(generate_series(1, $r)) AS INT) AS rater) r
       |), per_doc AS (
       |  SELECT doc_id, CAST(SUM(pos) AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS r
       |  FROM labels GROUP BY 1
       |), per_doc2 AS (
       |  SELECT doc_id, k, CAST(k * 2 > r AS INT) AS majority,
       |         k * (k - 1) + (r - k) * (r - k - 1) AS agree_pairs
       |  FROM per_doc
       |), totals AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(k) AS BIGINT) AS sum_k,
       |         CAST(SUM(agree_pairs) AS BIGINT) AS sum_agree
       |  FROM per_doc2
       |), stats AS (
       |  SELECT
       |    CAST(CAST(CAST(sum_agree AS DOUBLE) / CAST(n_docs * $r * ${r - 1} AS DOUBLE)
       |      AS DECIMAL(18,6)) AS DOUBLE) AS p_obs,
       |    CAST(CAST(
       |      (CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))
       |        * (CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))
       |      + (1.0 - CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))
       |        * (1.0 - CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))
       |      AS DECIMAL(18,6)) AS DOUBLE) AS p_exp,
       |    CAST(CAST(
       |      (CAST(sum_agree AS DOUBLE) / CAST(n_docs * $r * ${r - 1} AS DOUBLE)
       |       - ((CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))
       |            * (CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))
       |          + (1.0 - CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))
       |            * (1.0 - CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))))
       |      / (1.0 - ((CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))
       |            * (CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))
       |          + (1.0 - CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))
       |            * (1.0 - CAST(sum_k AS DOUBLE) / CAST(n_docs * $r AS DOUBLE))))
       |      AS DECIMAL(18,6)) AS DOUBLE) AS fleiss_kappa
       |  FROM totals
       |)
       |, card AS (
       |  SELECT l.rater, CAST(COUNT(*) AS BIGINT) AS n_labels,
       |         CAST(CAST(CAST(SUM(l.pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |           AS DECIMAL(18,6)) AS DOUBLE) AS pos_share,
       |         CAST(CAST(CAST(SUM(CASE WHEN l.pos = p.majority THEN 1 ELSE 0 END) AS DOUBLE)
       |           / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS majority_agree
       |  FROM labels l JOIN per_doc2 p USING (doc_id)
       |  GROUP BY 1
       |)
       |SELECT card.rater, card.n_labels, card.pos_share, card.majority_agree,
       |       stats.p_obs, stats.p_exp, stats.fleiss_kappa
       |FROM card, stats""".stripMargin
  }
}
