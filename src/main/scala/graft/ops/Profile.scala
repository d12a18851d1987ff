package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-source corpus profile — the "data card" a training-data pipeline
  * publishes next to every corpus drop: document and token volumes,
  * aggregate quality, dominant language, and exact-duplicate involvement,
  * one row per source. Composes the already-oracle-checked per-doc
  * signals ([[TextMetrics.quality]], [[TextMetrics.langId]],
  * [[TextMetrics.fingerprint]]) into source-grain aggregates.
  *
  * Determinism: `avg_quality` is a DECIMAL(18,6)-grid sum divided ONCE as
  * a double — summing doubles across rows would let aggregation order
  * move the low bits; summing on the decimal grid is exact, and the
  * single final division is the same IEEE operation in both engines.
  * `top_lang` breaks count ties alphabetically, so the argmax is total.
  *
  * Scale shape: every per-doc signal (words, quality, language,
  * fingerprint) is a projection of the same row, so the profile is ONE
  * codegen'd scan of `documents` — not a scan per signal stitched with
  * corpus-sized doc_id joins. The only row-level shuffle is the
  * exact-dup count, a window over the 16-byte fingerprint (group size =
  * duplicate multiplicity, no skew); the source-grain aggregates behind
  * it partial-aggregate map-side, so the second exchange carries
  * O(sources × langs) rows. No all-pairs step, no driver-side data.
  */
object Profile {

  /** The one-scan per-doc signal frame every profile path starts from
    * (package-visible: the streaming fold projects arriving batches
    * through the SAME expressions).
    */
  private[graft] def perDocOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("words"),
      TextMetrics.qualityScore.cast("decimal(18,6)").as("qd"),
      TextMetrics.predictedLangOf(col("text")).as("predicted_lang"),
      md5(TextMetrics.normalized(col("text"))).as("fingerprint"))

  private def perDoc(spark: SparkSession, dir: String): DataFrame =
    perDocOf(Tables.documents(spark, dir))

  /** Mergeable partial state at the (fingerprint, source, lang) grain —
    * sums only, so partials built per batch fold by re-summation.
    */
  private[graft] def partialOf(df: DataFrame): DataFrame =
    perDocOf(df)
      .groupBy("fingerprint", "source", "predicted_lang")
      .agg(count(lit(1)).as("cnt"), sum("words").as("w"), sum("qd").as("q"))

  /** Fold two partial-state frames into one (the merge every incremental
    * path shares).
    */
  private[graft] def mergeState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("fingerprint", "source", "predicted_lang")
      .agg(sum("cnt").as("cnt"), sum("w").as("w"), sum("q").as("q"))

  /** The data card rolled up from merged partial state. */
  private[graft] def cardFromState(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withTot = state.withColumn("fp_total",
      sum("cnt").over(Window.partitionBy("fingerprint")))
    val agg = withTot.groupBy("source")
      .agg(sum("cnt").as("n_docs"),
        sum("w").as("total_words"),
        sum("q").as("qsum"),
        sum(when(col("fp_total") > 1, col("cnt")).otherwise(0L)).as("dup_docs"))
    val topLang = state.groupBy("source", "predicted_lang")
      .agg(sum("cnt").as("lc"))
      .groupBy("source")
      .agg(min(struct((-col("lc")).as("nc"), col("predicted_lang").as("l"))).as("m"))
      .select(col("source"), col("m.l").as("top_lang"))
    agg.join(topLang, "source")
      .select(col("source"), col("n_docs"), col("total_words"),
        (col("qsum").cast("double") / col("n_docs")).as("avg_quality"),
        col("dup_docs"), col("top_lang"))
  }

  /** One row per source: doc/word volume, summed+averaged quality,
    * exact-dup involvement, dominant predicted language.
    */
  def corpusProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val flagged = perDoc(spark, dir).withColumn("fp_count",
      count(lit(1)).over(Window.partitionBy("fingerprint")))
    val agg = flagged.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("words").as("total_words"),
        sum("qd").as("qsum"),
        sum(when(col("fp_count") > 1, 1L).otherwise(0L)).as("dup_docs"))
    val topLang = flagged.groupBy("source", "predicted_lang")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      // min over (−count, lang): largest count first, alphabetical tiebreak
      .agg(min(struct((-col("cnt")).as("nc"), col("predicted_lang").as("l"))).as("m"))
      .select(col("source"), col("m.l").as("top_lang"))
    agg.join(topLang, "source")
      .select(col("source"), col("n_docs"), col("total_words"),
        (col("qsum").cast("double") / col("n_docs")).as("avg_quality"),
        col("dup_docs"), col("top_lang"))
  }

  /** The data card maintained INCREMENTALLY — MV maintenance for
    * governance, the [[EventsOps.dailyIncremental]] pattern applied to
    * the profile: partial state at the (fingerprint, source, lang)
    * grain is built for the existing corpus and for an arriving batch
    * separately (here: even/odd doc_id halves standing in for
    * yesterday's corpus and today's delivery), merged by summation, and
    * only then rolled up to the card. Every stored measure is a sum (or
    * count) — mergeable by construction — so absorbing a new batch
    * costs one scan of the BATCH plus a state-sized merge, never a
    * rescan of the corpus. The exact-dup count works across batches
    * because the fingerprint grain survives in the state: a duplicate
    * arriving months after its original still flips both rows' fp_total
    * above 1. The oracle is the full-recompute profile — incremental
    * maintenance must be invisible in the result, decimal-grid sums
    * make it exactly so.
    */
  def corpusProfileIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val state = partialOf(docs.filter(pmod(col("doc_id"), lit(2)) === 0))
    val delta = partialOf(docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    cardFromState(mergeState(state, delta))
  }

  val corpusProfileSql: String =
    s"""WITH q AS (
       |${TextMetrics.qualitySql}
       |), lang AS (
       |${TextMetrics.langIdSql}
       |), fp AS (
       |${TextMetrics.fingerprintSql}
       |), docs AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS words
       |  FROM documents
       |), dup AS (
       |  SELECT doc_id FROM fp
       |  WHERE fingerprint IN (
       |    SELECT fingerprint FROM fp GROUP BY 1 HAVING COUNT(*) > 1)
       |), agg AS (
       |  SELECT d.source,
       |         CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(d.words) AS BIGINT) AS total_words,
       |         SUM(CAST(q.quality_score AS DECIMAL(18,6))) AS qsum,
       |         CAST(SUM(CASE WHEN dp.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS dup_docs
       |  FROM docs d
       |  JOIN q USING (doc_id)
       |  LEFT JOIN dup dp USING (doc_id)
       |  GROUP BY 1
       |), lc AS (
       |  SELECT d.source, l.predicted_lang, COUNT(*) AS cnt
       |  FROM documents d JOIN lang l USING (doc_id)
       |  GROUP BY 1, 2
       |), tl AS (
       |  SELECT source, predicted_lang AS top_lang FROM (
       |    SELECT source, predicted_lang,
       |           ROW_NUMBER() OVER (PARTITION BY source
       |                              ORDER BY cnt DESC, predicted_lang) AS rn
       |    FROM lc)
       |  WHERE rn = 1
       |)
       |SELECT a.source, a.n_docs, a.total_words,
       |       CAST(a.qsum AS DOUBLE) / a.n_docs AS avg_quality,
       |       a.dup_docs, t.top_lang
       |FROM agg a JOIN tl t USING (source)""".stripMargin

  /** Per-source language-mix card: label-language Shannon entropy (nats)
    * + dominant-language share — the multilinguality balance metric a
    * mixture designer reads before setting per-language budgets (a
    * source at entropy ≈ 0 is monolingual; ln(n_langs) is the uniform
    * ceiling). Each entropy term −p·ln p is computed from exact integer
    * counts and rounded to the 6-dp decimal grid BEFORE the sum, so the
    * cross-language summation is decimal-exact and order-free (the
    * [[graft.ops.Drift.psi]] grid policy); the single `ln` follows the
    * bm25 precedent. One (source, lang) count aggregate — map-side
    * combined, output sources × langs then sources rows.
    */
  def langEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.Tables.documents(spark, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val tot = counts.groupBy("source").agg(sum("c").as("n_docs"),
      count(lit(1)).as("n_langs"))
    val p = col("c").cast("double") / col("n_docs").cast("double")
    val term = (-p * log(p)).cast("decimal(18,6)")
    val byShare = Window.partitionBy("source")
      .orderBy(col("c").desc, col("lang"))
    counts.join(tot, "source")
      .withColumn("rn", row_number().over(byShare))
      .groupBy("source", "n_docs", "n_langs")
      .agg(sum(term).cast("decimal(18,6)").as("entropy"),
        max(when(col("rn") === 1, col("lang"))).as("dominant_lang"),
        max(when(col("rn") === 1, p.cast("decimal(18,6)"))).as("dominant_share"))
      .select("source", "n_docs", "n_langs", "dominant_lang",
        "dominant_share", "entropy")
  }

  val langEntropySql: String =
    """WITH c AS (
      |  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2
      |), t AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
      |         CAST(COUNT(*) AS BIGINT) AS n_langs
      |  FROM c GROUP BY 1
      |), r AS (
      |  SELECT c.source, c.lang, c.c, t.n_docs, t.n_langs,
      |         CAST(c.c AS DOUBLE) / t.n_docs AS p,
      |         ROW_NUMBER() OVER (PARTITION BY c.source
      |                            ORDER BY c.c DESC, c.lang) AS rn
      |  FROM c JOIN t USING (source)
      |)
      |SELECT source, n_docs, n_langs,
      |       MAX(CASE WHEN rn = 1 THEN lang END) AS dominant_lang,
      |       CAST(MAX(CASE WHEN rn = 1 THEN CAST(p AS DECIMAL(18,6)) END) AS DOUBLE)
      |         AS dominant_share,
      |       CAST(CAST(SUM(CAST(-p * ln(p) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)
      |         AS entropy
      |FROM r GROUP BY 1, 2, 3""".stripMargin
}
