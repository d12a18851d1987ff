package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a fixed-weight logistic classifier over
  * the deterministic per-document features the pipeline already extracts
  * ([[TextMetrics.quality]] components + the Gopher repetition signals of
  * [[TextMetrics.repetition]]).
  *
  * This is the shape of the fasttext-style "model-based quality filter"
  * stage every published pretraining pipeline runs after rule-based
  * filtering (CCNet, Gopher, RefinedWeb all score documents with a linear
  * model and keep by threshold); the weights here are fixed literals so
  * the stage is reproducible and oracle-checkable, standing in for
  * externally-trained coefficients a production run would broadcast.
  *
  * Scale shape: the feature join is doc_id⋈doc_id between a narrow
  * single-pass projection and the repetition aggregate (which is already
  * hash-partitioned by doc_id coming out of its gram rollups), so scoring
  * adds no exchange beyond what feature extraction itself needs; the
  * model apply is a codegen'd scalar expression, no UDF.
  */
object QualityModel {

  /** (intercept, len_score, unique_ratio, stopword_ratio, top_word_frac,
    * dup_trigram_frac) — signs follow the published filters: length,
    * lexical diversity and stopword presence predict "keep"; repetition
    * predicts "drop".
    */
  val weights: (Double, Double, Double, Double, Double, Double) =
    (-2.0, 1.5, 2.0, 1.0, -3.0, -2.0)

  def score(spark: SparkSession, dir: String): DataFrame = {
    val (b, wLen, wUniq, wStop, wTop, wDup) = weights
    val feats = TextMetrics.quality(spark, dir)
      .join(
        TextMetrics.repetition(spark, dir)
          .select(col("doc_id"), col("top_word_frac"), col("dup_trigram_frac")),
        Seq("doc_id"), "left")
    // docs too short for the repetition gate (<3 words) default to the
    // worst repetition reading — published filters drop degenerate docs
    val z = lit(b) +
      col("len_score") * wLen +
      coalesce(col("unique_ratio"), lit(0.0)) * wUniq +
      coalesce(col("stopword_ratio"), lit(0.0)) * wStop +
      coalesce(col("top_word_frac"), lit(1.0)) * wTop +
      coalesce(col("dup_trigram_frac"), lit(1.0)) * wDup
    val s = lit(1.0) / (lit(1.0) + exp(-z))
    feats.select(
      col("doc_id"),
      z.cast("decimal(18,6)").as("logit"),
      s.cast("decimal(18,6)").as("model_score"),
      (s >= 0.5).as("keep"))
  }

  /** DuckDB oracle: the same features assembled from the same CTEs as the
    * quality/repetition oracles, pushed through the identical linear form.
    */
  /** Per-source quality calibration — source-fair filtering: a GLOBAL
    * quality threshold guts whole low-scoring sources (different
    * registers score differently under fixed heuristics), so production
    * recipes threshold each document against its OWN source's
    * distribution. Each doc gets its within-source percentile (fraction
    * of the source scoring strictly below it) and `keep` = percentile ≥
    * `dropFrac` — the bottom `dropFrac` of EVERY source drops, no source
    * is wiped out.
    *
    * Scale shape: the percentile is NOT a per-doc rank window (a
    * mega-source would sort all its docs in one partition). The score
    * lands on a 10⁻⁶ grid; the CDF is computed on the (source, grid)
    * HISTOGRAM — one map-side-combined count, then windows over ≤ 10⁶
    * grid rows per source — and joined back. Grid-bounded, never
    * doc-bounded.
    */
  def calibrated(spark: SparkSession, dir: String,
                 dropFrac: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = TextMetrics.quality(spark, dir)
      .select(col("doc_id"), col("quality_score"))
      .join(graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source")), "doc_id")
      .withColumn("qg", round(col("quality_score") * 1e6).cast("long"))
    val bySrc = Window.partitionBy("source").orderBy("qg")
    val cdf = docs.groupBy("source", "qg").agg(count(lit(1)).as("c"))
      .withColumn("below", coalesce(sum("c")
        .over(bySrc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_src", sum("c").over(Window.partitionBy("source")))
      .select("source", "qg", "below", "n_src")
    docs.join(cdf, Seq("source", "qg"))
      .select(col("doc_id"), col("source"), col("quality_score"),
        (col("below").cast("double") / col("n_src").cast("double"))
          .as("src_percentile"),
        (col("below").cast("double") / col("n_src").cast("double") >= dropFrac)
          .as("keep"))
  }

  def calibratedSql(dropFrac: Double = 0.2): String =
    s"""WITH q AS (
       |  ${TextMetrics.qualitySql.replace("\n", "\n  ")}
       |), d AS (
       |  SELECT q.doc_id, doc.source, q.quality_score,
       |         CAST(round(q.quality_score * 1000000.0) AS BIGINT) AS qg
       |  FROM q JOIN documents doc USING (doc_id)
       |), hist AS (
       |  SELECT source, qg, COUNT(*) AS c FROM d GROUP BY 1, 2
       |), cdf AS (
       |  SELECT source, qg,
       |         COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY qg
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
       |         SUM(c) OVER (PARTITION BY source) AS n_src
       |  FROM hist
       |)
       |SELECT d.doc_id, d.source, d.quality_score,
       |       CAST(cdf.below AS DOUBLE) / CAST(cdf.n_src AS DOUBLE) AS src_percentile,
       |       CAST(cdf.below AS DOUBLE) / CAST(cdf.n_src AS DOUBLE) >= $dropFrac AS keep
       |FROM d JOIN cdf ON cdf.source = d.source AND cdf.qg = d.qg""".stripMargin

  def scoreSql: String = {
    val (b, wLen, wUniq, wStop, wTop, wDup) = weights
    s"""WITH q AS (
       |  SELECT doc_id,
       |    LEAST(1.0, CAST(length(text) AS DOUBLE) / 500.0) AS len_score,
       |    CAST(len(list_distinct(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))) AS DOUBLE)
       |      / NULLIF(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE), 0) AS unique_ratio,
       |    CAST(len(regexp_extract_all(lower(text), '\\b(the|a|of|and|to|in|is|that)\\b')) AS DOUBLE)
       |      / NULLIF(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE), 0) AS stopword_ratio
       |  FROM documents
       |), ws AS (
       |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents
       |), s1 AS (
       |  SELECT doc_id, CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_word_frac
       |  FROM (SELECT doc_id, g, count(*) AS cnt
       |        FROM (SELECT doc_id, unnest(ws) AS g FROM ws WHERE len(ws) >= 3)
       |        GROUP BY 1, 2)
       |  GROUP BY 1
       |), s3 AS (
       |  SELECT doc_id,
       |         CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dup_trigram_frac
       |  FROM (SELECT doc_id, g, count(*) AS cnt
       |        FROM (SELECT doc_id, ws[i.i] || ' ' || ws[i.i+1] || ' ' || ws[i.i+2] AS g
       |              FROM ws CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS i) i
       |              WHERE len(ws) >= 3)
       |        GROUP BY 1, 2)
       |  GROUP BY 1
       |), z AS (
       |  SELECT q.doc_id,
       |    ($b) + q.len_score * ($wLen)
       |         + COALESCE(q.unique_ratio, 0) * ($wUniq)
       |         + COALESCE(q.stopword_ratio, 0) * ($wStop)
       |         + COALESCE(s1.top_word_frac, 1.0) * ($wTop)
       |         + COALESCE(s3.dup_trigram_frac, 1.0) * ($wDup) AS z
       |  FROM q LEFT JOIN s1 USING (doc_id) LEFT JOIN s3 USING (doc_id)
       |)
       |SELECT doc_id,
       |  CAST(CAST(z AS DECIMAL(18,6)) AS DOUBLE) AS logit,
       |  CAST(CAST(1.0 / (1.0 + exp(-z)) AS DECIMAL(18,6)) AS DOUBLE) AS model_score,
       |  1.0 / (1.0 + exp(-z)) >= 0.5 AS keep
       |FROM z""".stripMargin
  }
}
