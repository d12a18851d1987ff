package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The end-to-end curation DAG — every stage the library provides,
  * CHAINED THROUGH MATERIALIZED FILES the way a production pipeline
  * runs them, with one cross-stage reconciliation result:
  *
  *   input → clean (exact-dup canonical + quality-aware near-dup
  *   survivor + contamination + quality/length/repetition rules)
  *   → write + reload → pack assignments (two-tier prefix sum)
  *   → write + reload → sequence rollup → write + reload
  *   → reconciliation over the RELOADED files.
  *
  * The registered result is one row per stage boundary
  * (stage_ord, stage, n_docs, n_tokens), every number computed from
  * the files read back, never from the in-memory lineage — a row lost
  * in a write, duplicated by a task retry, or a packing bug that drops
  * or double-counts a token shows up as a count mismatch against the
  * DuckDB oracle, which recomputes each stage's expected totals from
  * the rule chain directly. Token counts use the normalized
  * whitespace tokenization every packing/sharding operator shares
  * ([[Pack]]), so `cleaned.n_tokens == packed.n_tokens ==
  * sequences.n_tokens` is the invariant the chain must conserve, and
  * `sequences.n_docs == ⌈n_tokens / seqLen⌉` pins the rollup.
  *
  * Unlike [[CorpusFilter.report]] (min-id near-dup canonical), the
  * DAG's dedup stage keeps each near-dup cluster's HIGHEST-QUALITY
  * member ([[Dedup.keepBest]]) — the survivor policy a real curation
  * run ships.
  *
  * Scale shape: each stage is the already-audited operator (hash joins
  * on doc_id, band-bounded dedup, two-tier prefix sum); the extra cost
  * of the DAG form is one REBALANCE-compacted write + scan per stage
  * boundary — exactly what a checkpointed lakehouse pipeline pays.
  */
object CurationE2e {

  private def docTokens: Column =
    size(split(TextMetrics.normalized(col("text")), " ")).cast("long")

  def run(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "curation_e2e", dir, "curation_e2e") {
      val out = java.nio.file.Files
        .createTempDirectory("graft_curation_e2e").toFile
      out.deleteOnExit()
      val docs = Tables.documents(spark, dir)

      // ---- stage 1: clean ----
      val fp = TextMetrics.fingerprint(spark, dir)
      val exact = fp
        .join(fp.groupBy("fingerprint").agg(min("doc_id").as("canonical")),
          "fingerprint")
        .select("doc_id", "canonical")
      val near = Dedup.canonical(spark, dir)
        .join(Dedup.keepBest(spark, dir).select("canonical_id", "keep_doc"),
          "canonical_id")
        .select("doc_id", "keep_doc")
      val stats = TextMetrics.stats(spark, dir).select("doc_id", "word_count")
      val qual = TextMetrics.quality(spark, dir).select("doc_id", "quality_score")
      val rep = TextMetrics.repetition(spark, dir).select("doc_id", "dup_trigram_frac")
      val cont = Contamination.report(spark, dir).select("doc_id", "contaminated")
      val reason =
        when(col("doc_id") =!= col("canonical"), "duplicate")
          .when(col("keep_doc").isNotNull && col("doc_id") =!= col("keep_doc"),
            "near_duplicate")
          .when(coalesce(col("contaminated"), lit(false)), "contaminated")
          .when(col("word_count") < CorpusFilter.minWords, "too_short")
          .when(col("quality_score") < CorpusFilter.minQuality, "low_quality")
          .when(coalesce(col("dup_trigram_frac"), lit(0.0)) >
            CorpusFilter.maxDupTrigram, "repetitive")
      val cleaned = docs
        .join(exact, "doc_id")
        .join(stats, "doc_id")
        .join(qual, "doc_id")
        .join(rep, Seq("doc_id"), "left")
        .join(cont, Seq("doc_id"), "left")
        .join(near, Seq("doc_id"), "left")
        .filter(reason.isNull)
        .select(docs.columns.map(col): _*)
      val cleanedPath = s"${out.getAbsolutePath}/cleaned"
      cleaned.hint("rebalance").write.mode("overwrite").parquet(cleanedPath)
      val cleanedR = spark.read.parquet(cleanedPath)

      // ---- stage 2: pack the RELOADED cleaned corpus ----
      val asgPath = s"${out.getAbsolutePath}/assignments"
      Pack.assignmentsFrom(cleanedR)
        .hint("rebalance").write.mode("overwrite").parquet(asgPath)
      val asgR = spark.read.parquet(asgPath)

      // ---- stage 3: sequence rollup of the RELOADED assignments ----
      val seqPath = s"${out.getAbsolutePath}/sequences"
      Pack.packOf(asgR)
        .hint("rebalance").write.mode("overwrite").parquet(seqPath)
      val seqR = spark.read.parquet(seqPath)

      // ---- reconciliation, every row from reloaded data ----
      def row(ord: Int, name: String, df: DataFrame,
              nDocs: Column, nToks: Column): DataFrame =
        df.agg(nDocs.as("n_docs"), nToks.as("n_tokens"))
          .select(lit(ord).as("stage_ord"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"))
      row(0, "input", docs, count(lit(1)), sum(docTokens))
        .unionByName(row(1, "cleaned", cleanedR, count(lit(1)), sum(docTokens)))
        .unionByName(row(2, "packed", asgR, count(lit(1)), sum(col("doc_tokens"))))
        .unionByName(row(3, "sequences", seqR, count(lit(1)), sum(col("seq_tokens"))))
    }

  /** The oracle recomputes every stage's expected totals from the rule
    * chain — the Spark side reads them from reloaded files, so the
    * comparison IS the conservation proof.
    *
    * kb / cl / toks / kept are MATERIALIZED: DuckDB inlines plain CTEs
    * at each reference, and `kept` (which embeds BOTH near-dup replays)
    * feeds three UNION legs — inlined, the LSH pair replay executes
    * ~12x and the 10x fixture blows a 165 GB spill budget; materialized
    * it executes once per replay, the same footprint as the standalone
    * dedup oracles (values unchanged).
    */
  val runSql: String =
    s"""WITH kb AS MATERIALIZED (
       |${Dedup.keepBestSql(0.5)}
       |), cl AS MATERIALIZED (
       |${Dedup.canonicalSql(0.5)}
       |), toks AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT) AS toks
       |  FROM documents
       |), fpr AS (
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
       |), kept AS MATERIALIZED (
       |  SELECT d.doc_id, toks.toks
       |  FROM documents d
       |  JOIN exact e USING (doc_id)
       |  JOIN st USING (doc_id)
       |  JOIN qq USING (doc_id)
       |  JOIN toks ON toks.doc_id = d.doc_id
       |  LEFT JOIN rr USING (doc_id)
       |  LEFT JOIN cc USING (doc_id)
       |  LEFT JOIN cl ON cl.doc_id = d.doc_id
       |  LEFT JOIN kb ON kb.canonical_id = cl.canonical_id
       |  WHERE CASE WHEN e.doc_id <> e.canonical THEN 'duplicate'
       |             WHEN cl.doc_id IS NOT NULL
       |                  AND kb.keep_doc <> d.doc_id THEN 'near_duplicate'
       |             WHEN COALESCE(cc.contaminated, FALSE) THEN 'contaminated'
       |             WHEN st.word_count < ${CorpusFilter.minWords} THEN 'too_short'
       |             WHEN qq.quality_score < ${CorpusFilter.minQuality} THEN 'low_quality'
       |             WHEN COALESCE(rr.dup_trigram_frac, 0.0) > ${CorpusFilter.maxDupTrigram} THEN 'repetitive'
       |        END IS NULL
       |)
       |SELECT CAST(0 AS INT) AS stage_ord, 'input' AS stage,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens
       |FROM toks
       |UNION ALL
       |SELECT 1, 'cleaned', CAST(COUNT(*) AS BIGINT), CAST(SUM(toks) AS BIGINT) FROM kept
       |UNION ALL
       |SELECT 2, 'packed', CAST(COUNT(*) AS BIGINT), CAST(SUM(toks) AS BIGINT) FROM kept
       |UNION ALL
       |SELECT 3, 'sequences',
       |       CAST((SUM(toks) + ${Pack.seqLen - 1}) // ${Pack.seqLen} AS BIGINT),
       |       CAST(SUM(toks) AS BIGINT)
       |FROM kept""".stripMargin
}
