package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus curation — the capstone of the training-data pipeline: compose
  * the individual signals (exact-dup canonicalization, benchmark
  * contamination, quality score, repetition, length) into one keep/drop
  * decision per document with the FIRST failing rule as the reject
  * reason (fixed rule order ⇒ deterministic reasons).
  *
  * Scale shape: every input is a per-doc frame keyed by doc_id — the
  * composition is a chain of hash joins on the same key (co-partitioned
  * after the first shuffle), no pair-producing step anywhere.
  */
object CorpusFilter {

  val minWords = 10
  val minQuality = 0.25
  val maxDupTrigram = 0.5

  def report(spark: SparkSession, dir: String): DataFrame = {
    val fp = TextMetrics.fingerprint(spark, dir)
    val canon = fp.groupBy("fingerprint").agg(min("doc_id").as("canonical"))
    val exact = fp.join(canon, "fingerprint").select("doc_id", "canonical")
    val stats = TextMetrics.stats(spark, dir).select("doc_id", "word_count")
    val qual = TextMetrics.quality(spark, dir).select("doc_id", "quality_score")
    val rep = TextMetrics.repetition(spark, dir).select("doc_id", "dup_trigram_frac")
    val cont = Contamination.report(spark, dir).select("doc_id", "contaminated")
    // MinHash→LSH→Jaccard-verified components; present only for members
    val near = Dedup.canonical(spark, dir)
      .select(col("doc_id"), col("canonical_id").as("near_canonical"))

    val reason =
      when(col("doc_id") =!= col("canonical"), "duplicate")
        .when(col("near_canonical").isNotNull &&
          col("near_canonical") =!= col("doc_id"), "near_duplicate")
        .when(coalesce(col("contaminated"), lit(false)), "contaminated")
        .when(col("word_count") < minWords, "too_short")
        .when(col("quality_score") < minQuality, "low_quality")
        .when(coalesce(col("dup_trigram_frac"), lit(0.0)) > maxDupTrigram, "repetitive")

    Tables.documents(spark, dir).select("doc_id")
      .join(exact, "doc_id")
      .join(stats, "doc_id")
      .join(qual, "doc_id")
      .join(rep, Seq("doc_id"), "left") // absent for docs under 3 words
      .join(cont, Seq("doc_id"), "left") // absent for eval docs
      .join(near, Seq("doc_id"), "left") // absent outside near-dup components
      .select(col("doc_id"), reason.isNull.as("keep"),
        reason.as("reject_reason"))
  }

  // ---------- DuckDB oracle (composes the component oracles) ----------

  /** Materialize the curated corpus — the step after the keep/drop
    * decision: write the kept documents as REBALANCE-compacted parquet
    * (AQE right-sizes the files — at 100 TB an unbalanced write here is
    * a small-file explosion), read the files back, and report per-source
    * reconciliation totals FROM THE RELOADED DATA. The oracle recomputes
    * the same totals from the keep rule directly, so a drop lost in the
    * write path, a row duplicated by a partial task retry, or a
    * truncated file diverges the counts. Same write-then-reload proof
    * shape as `export_reconcile`, applied to the curation output.
    */
  def export(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "corpus_export", dir, "corpus_export") {
      val kept = report(spark, dir).filter(col("keep")).select("doc_id")
        .join(graft.Tables.documents(spark, dir), "doc_id")
      val out = java.nio.file.Files
        .createTempDirectory("graft_corpus_export").toFile
      out.deleteOnExit()
      val target = s"${out.getAbsolutePath}/curated"
      kept.hint("rebalance").write.mode("overwrite").parquet(target)
      spark.read.parquet(target)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").as("sum_ids"),
          min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
    }

  def exportSql: String =
    s"""WITH rep AS (
       |$reportSql
       |)
       |SELECT d.source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(d.doc_id) AS BIGINT) AS sum_ids,
       |  CAST(MIN(d.doc_id) AS BIGINT) AS min_id,
       |  CAST(MAX(d.doc_id) AS BIGINT) AS max_id
       |FROM rep JOIN documents d USING (doc_id)
       |WHERE rep.keep
       |GROUP BY 1""".stripMargin

  val reportSql: String =
    s"""WITH fpr AS (
       |  SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
       |  FROM documents
       |), exact AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS canonical FROM fpr
       |), st AS (
       |  SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS word_count
       |  FROM documents
       |), qq AS (
       |  SELECT doc_id, quality_score FROM (${TextMetrics.qualitySql}) t
       |), rr AS (
       |  SELECT doc_id, dup_trigram_frac FROM (${TextMetrics.repetitionSql}) t
       |), cc AS (
       |  SELECT doc_id, contaminated FROM (${Contamination.reportSql}) t
       |), nn AS (
       |  SELECT doc_id, canonical_id AS near_canonical FROM (${Dedup.canonicalSql()}) t
       |), composed AS (
       |  SELECT d.doc_id,
       |         CASE WHEN e.doc_id <> e.canonical THEN 'duplicate'
       |              WHEN nn.near_canonical IS NOT NULL
       |                   AND nn.near_canonical <> d.doc_id THEN 'near_duplicate'
       |              WHEN COALESCE(cc.contaminated, FALSE) THEN 'contaminated'
       |              WHEN st.word_count < $minWords THEN 'too_short'
       |              WHEN qq.quality_score < $minQuality THEN 'low_quality'
       |              WHEN COALESCE(rr.dup_trigram_frac, 0.0) > $maxDupTrigram THEN 'repetitive'
       |         END AS reject_reason
       |  FROM documents d
       |  JOIN exact e USING (doc_id)
       |  JOIN st USING (doc_id)
       |  JOIN qq USING (doc_id)
       |  LEFT JOIN rr USING (doc_id)
       |  LEFT JOIN cc USING (doc_id)
       |  LEFT JOIN nn USING (doc_id)
       |)
       |SELECT doc_id, reject_reason IS NULL AS keep, reject_reason FROM composed""".stripMargin
}
