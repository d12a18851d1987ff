package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table (`doc_id, text, lang, source, n_chars`). All are
  * single-pass narrow projections/aggregations — at 100 TB they scan the
  * text column once, no shuffle (stats) or one shuffle (fingerprint
  * groupBy), and stay inside whole-stage codegen (built-in string
  * functions only, no UDFs).
  */
object TextMetrics {

  /** lower + collapse whitespace + trim: the canonical form used for
    * exact-dedup fingerprinting.
    */
  def normalized(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Per-document token/char statistics (token_count: whitespace words +
    * a BPE-ish regex token count — letter runs, digit runs, or single
    * non-space symbols).
    */
  def stats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("char_len"),
      size(split(trim(col("text")), "\\s+")).as("word_count"),
      size(array_distinct(split(normalized(col("text")), " "))).as("unique_words"),
      regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("subword_count"),
      // raw double — a DECIMAL cast rounds, and the engines disagree on
      // double→decimal rounding when the true ratio terminates in decimal
      // but not in binary (e.g. chars/80 landing on .xxxx5)
      (length(regexp_replace(col("text"), "\\s", "")).cast("double") /
        nullif(size(split(trim(col("text")), "\\s+")).cast("double")))
        .as("avg_word_len")
    )

  private def nullif(c: Column): Column = when(c === 0.0, lit(null)).otherwise(c)

  /** Language-ID heuristic: per-language function-word hit counts
    * (word-boundary regex), predicted language = argmax with alphabetical
    * tiebreak, 'und' when nothing matches.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|zu)\\b",
    "en" -> "\\b(the|a|of|and|to|in|is|that)\\b",
    "es" -> "\\b(el|la|los|las|de|que|y|es)\\b",
    "fr" -> "\\b(le|la|les|des|et|est|que|une)\\b"
  )

  /** The argmax-language expression over a text column — the exact rule
    * [[langId]] registers, exposed for single-scan consumers
    * ([[Profile]]) that fuse it with other per-doc projections.
    */
  def predictedLangOf(text: Column): Column = {
    val hits = langMarkers.map { case (l, re) =>
      l -> regexp_count(lower(text), lit(re))
    }
    val best = greatest(hits.map(_._2): _*)
    hits.foldLeft(Option.empty[Column]) {
      case (None, (l, h))    => Some(when(best > 0 && h === best, l))
      case (Some(c), (l, h)) => Some(c.when(best > 0 && h === best, l))
    }.get.otherwise("und")
  }

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(
      col("doc_id") +: langMarkers.map { case (l, re) =>
        regexp_count(lower(col("text")), lit(re)).as(s"hits_$l")
      }: _*)
    // argmax via greatest + cascaded when (alphabetical order breaks ties)
    val best = greatest(langMarkers.map(m => col(s"hits_${m._1}")): _*)
    val predAlpha = langMarkers.foldLeft(Option.empty[Column]) {
      case (None, (l, _)) => Some(when(best > 0 && col(s"hits_$l") === best, l))
      case (Some(c), (l, _)) => Some(c.when(best > 0 && col(s"hits_$l") === best, l))
    }.get.otherwise("und")
    base.select(col("doc_id"), col("hits_de"), col("hits_en"), col("hits_es"),
      col("hits_fr"), predAlpha.as("predicted_lang"))
  }

  /** Quality scoring: length, lexical diversity, stopword-rate components
    * combined into one score (the shape of a pretraining quality filter).
    */
  private def words: Column = size(split(trim(col("text")), "\\s+")).cast("double")
  private def lenScore: Column =
    least(lit(1.0), length(col("text")).cast("double") / 500.0)
  private def uniqRatio: Column =
    size(array_distinct(split(normalized(col("text")), " "))).cast("double") / nullif(words)
  private def stopRatio: Column =
    regexp_count(lower(col("text")),
      lit("\\b(the|a|of|and|to|in|is|that)\\b")).cast("double") / nullif(words)

  /** The combined quality score as a column over `text` — the exact
    * formula [[quality]] emits, exposed for rank-based consumers
    * ([[Curriculum]]).
    */
  def qualityScore: Column =
    lenScore * 0.4 + coalesce(uniqRatio, lit(0.0)) * 0.4 +
      coalesce(stopRatio, lit(0.0)) * 0.2

  def quality(spark: SparkSession, dir: String): DataFrame =
    // raw doubles throughout (see avg_word_len note): identical IEEE
    // arithmetic in both engines, no rounding step to diverge on
    Tables.documents(spark, dir).select(
      col("doc_id"),
      lenScore.as("len_score"),
      uniqRatio.as("unique_ratio"),
      stopRatio.as("stopword_ratio"),
      qualityScore.as("quality_score")
    )

  /** Document fingerprint: md5 of the normalized text — the exact-dedup
    * key (a content-defined fingerprint both engines compute identically).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), md5(normalized(col("text"))).as("fingerprint"))

  /** Gopher-style repetition signals (the published quality-filter rules
    * for pretraining corpora): per document, the fraction of words taken
    * by the most frequent word / bigram and the fraction of duplicated
    * trigrams. High values mark boilerplate and degenerate repetition.
    *
    * Every ratio is a single division of two integer counts — no decimal
    * step, no order-dependent float accumulation, so both engines compute
    * bit-identical doubles. Scale shape: three gram-level shuffles with
    * map-side combine; all three aggregates come out hash-partitioned by
    * doc_id, so the final joins need no extra exchange.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), split(normalized(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)

    def gram(n: Int): Column =
      if (n == 1) explode(col("ws"))
      else graft.functions.WordNgramFunctions.wordNgrams(spark, col("ws"), n)

    def stats(n: Int): DataFrame = base
      .select(col("doc_id"), gram(n).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum("cnt").as(s"total_$n"),
        max("cnt").as(s"top_$n"),
        count(lit(1)).as(s"distinct_$n"))

    stats(1).join(stats(2), "doc_id").join(stats(3), "doc_id")
      .select(
        col("doc_id"),
        col("total_1").as("total_words"),
        (col("top_1").cast("double") / col("total_1").cast("double")).as("top_word_frac"),
        (col("top_2").cast("double") / col("total_2").cast("double")).as("top_bigram_frac"),
        ((col("total_3") - col("distinct_3")).cast("double") /
          col("total_3").cast("double")).as("dup_trigram_frac"))
  }

  // ---------- DuckDB oracles ----------

  val statsSql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS INT) AS char_len,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS word_count,
      |  CAST(len(list_distinct(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))) AS INT) AS unique_words,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS subword_count,
      |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
      |       / NULLIF(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 0) AS avg_word_len
      |FROM documents""".stripMargin

  /** Classifier-evaluation confusion matrix for [[langId]] against the
    * corpus's labeled `lang` column: one scan re-deriving the argmax
    * prediction (no join back to the prediction table), rolled up to
    * (actual, predicted) cells with the within-class share — per-class
    * recall read directly off the diagonal. Scale: one scan + a
    * cells-sized aggregate; the share window partitions over ≤
    * |langs|² rows.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .select(col("lang"), predictedLangOf(col("text")).as("predicted_lang"))
      .groupBy("lang", "predicted_lang").agg(count(lit(1)).as("n"))
    cells.withColumn("class_share",
      col("n").cast("double") / sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")))
  }

  val langConfusionSql: String = {
    val hits = langMarkers.map { case (l, re) =>
      s"CAST(len(regexp_extract_all(lower(text), '$re')) AS INT) AS hits_$l"
    }.mkString(",\n  ")
    val best = "GREATEST(hits_de, hits_en, hits_es, hits_fr)"
    val pred = langMarkers.map { case (l, _) =>
      s"WHEN $best > 0 AND hits_$l = $best THEN '$l'"
    }.mkString(" ")
    s"""WITH h AS (
       |  SELECT lang, $hits
       |  FROM documents
       |), p AS (
       |  SELECT lang, CASE $pred ELSE 'und' END AS predicted_lang FROM h
       |), c AS (
       |  SELECT lang, predicted_lang, COUNT(*) AS n FROM p GROUP BY 1, 2
       |)
       |SELECT lang, predicted_lang, n,
       |       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY lang) AS class_share
       |FROM c""".stripMargin
  }

  val langIdSql: String = {
    val hits = langMarkers.map { case (l, re) =>
      s"CAST(len(regexp_extract_all(lower(text), '$re')) AS INT) AS hits_$l"
    }.mkString(",\n  ")
    val best = "GREATEST(hits_de, hits_en, hits_es, hits_fr)"
    val pred = langMarkers.map { case (l, _) =>
      s"WHEN $best > 0 AND hits_$l = $best THEN '$l'"
    }.mkString(" ")
    s"""WITH h AS (
       |  SELECT doc_id, $hits
       |  FROM documents
       |)
       |SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
       |       CASE $pred ELSE 'und' END AS predicted_lang
       |FROM h""".stripMargin
  }

  val qualitySql: String =
    """WITH q AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS words,
      |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|that)\b')) AS DOUBLE) AS stop_hits,
      |    CAST(len(list_distinct(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))) AS DOUBLE) AS uniq,
      |    LEAST(1.0, CAST(length(text) AS DOUBLE) / 500.0) AS len_score
      |  FROM documents
      |)
      |SELECT doc_id,
      |  len_score,
      |  uniq / NULLIF(words, 0) AS unique_ratio,
      |  stop_hits / NULLIF(words, 0) AS stopword_ratio,
      |  len_score * 0.4 + COALESCE(uniq / NULLIF(words, 0), 0) * 0.4
      |       + COALESCE(stop_hits / NULLIF(words, 0), 0) * 0.2 AS quality_score
      |FROM q""".stripMargin

  val fingerprintSql: String =
    """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
      |FROM documents""".stripMargin

  // DuckDB sums of BIGINT widen to HUGEINT — cast back so the schema
  // matches Spark's LongType
  val repetitionSql: String =
    """WITH ws AS (
      |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
      |  FROM documents
      |), g1 AS (
      |  SELECT doc_id, unnest(ws) AS g FROM ws WHERE len(ws) >= 3
      |), s1 AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total, CAST(max(cnt) AS BIGINT) AS top
      |  FROM (SELECT doc_id, g, count(*) AS cnt FROM g1 GROUP BY 1, 2) GROUP BY 1
      |), g2 AS (
      |  SELECT doc_id, ws[i.i] || ' ' || ws[i.i+1] AS g
      |  FROM ws CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) i
      |  WHERE len(ws) >= 3
      |), s2 AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total, CAST(max(cnt) AS BIGINT) AS top
      |  FROM (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2) GROUP BY 1
      |), g3 AS (
      |  SELECT doc_id, ws[i.i] || ' ' || ws[i.i+1] || ' ' || ws[i.i+2] AS g
      |  FROM ws CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS i) i
      |  WHERE len(ws) >= 3
      |), s3 AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS dist
      |  FROM (SELECT doc_id, g, count(*) AS cnt FROM g3 GROUP BY 1, 2) GROUP BY 1
      |)
      |SELECT s1.doc_id, s1.total AS total_words,
      |  CAST(s1.top AS DOUBLE) / CAST(s1.total AS DOUBLE) AS top_word_frac,
      |  CAST(s2.top AS DOUBLE) / CAST(s2.total AS DOUBLE) AS top_bigram_frac,
      |  CAST(s3.total - s3.dist AS DOUBLE) / CAST(s3.total AS DOUBLE) AS dup_trigram_frac
      |FROM s1 JOIN s2 USING (doc_id) JOIN s3 USING (doc_id)""".stripMargin
}
