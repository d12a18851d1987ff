package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact substring-span dedup signal (Lee et al., ACL'22,
  * "Deduplicating Training Data Makes Language Models Better" —
  * public technique): find, per document, the MAXIMAL word spans whose
  * every length-`n` window recurs elsewhere in the corpus (or elsewhere
  * in the same document). The paper builds a corpus-wide suffix array;
  * the distributed reformulation here is anchor-based — a suffix array
  * does not shard, n-gram position tables do:
  *
  *  1. positional n-grams: (doc_id, pos, gram) for every word offset —
  *     unlike [[Contamination]]'s per-doc DISTINCT n-gram table, this
  *     keeps positions and within-doc repeats, because a span is a run
  *     of POSITIONS;
  *  2. an anchor is covered iff its gram occurs ≥ 2 times corpus-wide
  *     (one map-side-combined count, one hash join back — the only
  *     corpus-scale shuffles, the same cost class as `dup_ngrams`);
  *  3. covered anchors expand to word intervals [pos, pos+n−1] and
  *     overlapping-or-adjacent intervals merge into maximal spans via
  *     the running-max-end island construction (`max(end) OVER rows
  *     preceding` → new-island flag → running island id). Windows
  *     partition by doc_id — bounded by document length, never corpus.
  *
  * Interval union, not anchor-run union: two covered anchors 3 apart at
  * n = 5 overlap as WORD ranges even though the anchor run has a gap —
  * summing per-run lengths would double-count the overlap, so the merge
  * is on the expanded intervals. Output is the per-document audit row
  * (span count, duplicated-word total, fraction); the spans themselves
  * stay distributed.
  *
  * Relation to the neighbors: `dup_ngrams` ranks the hottest single
  * grams; [[SegmentDedup]] dedups FIXED segments; this reports
  * arbitrary-length maximal duplicated spans — the signal the paper
  * showed matters (boilerplate/licenses/templates repeat as long runs,
  * not fixed blocks).
  */
object SubstringDedup {

  /** Anchor width in words (the paper's 50-token threshold scaled to the
    * fixture's short synthetic docs).
    */
  val n = 5

  /** Positional n-gram anchors: (doc_id, pos, gram), pos 0-based. */
  private def anchors(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(TextMetrics.normalized(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), posexplode(transform(sequence(lit(0), size(col("ws")) - n),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(col("ws"), i + j + 1)): _*)))
        .as(Seq("pos", "gram")))

  def report(spark: SparkSession, dir: String): DataFrame =
    // memoize the positional-anchor frame: reportOf consumes it on BOTH
    // sides of the hot-gram join (the count and the join-back) —
    // unmemoized, each branch re-runs the scan + explode
    reportOf(graft.Memo(spark, "substring_anchors", dir, "substring_anchors") {
      anchors(Tables.documents(spark, dir))
    }, Tables.documents(spark, dir))

  /** Per-document duplicated-span audit over any documents-shaped frame:
    * (doc_id, n_words, n_spans, dup_words, dup_frac) for documents
    * carrying at least one span. The spec drives this with a planted
    * fixture whose maximal spans are hand-computable.
    */
  def reportOf(docs: DataFrame): DataFrame = reportOf(anchors(docs), docs)

  private def reportOf(a: DataFrame, docs: DataFrame): DataFrame = {
    val hot = a.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("gram")
    val covered = a.join(hot, "gram").select(col("doc_id"), col("pos"))

    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevMaxEnd = max(col("pos") + lit(n - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = covered
      .withColumn("new_island",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd + 1, 1L).otherwise(0L))
      .withColumn("island", sum("new_island")
        .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("start"), max(col("pos") + lit(n - 1)).as("end"))
      .select(col("doc_id"), (col("end") - col("start") + 1).as("span_words"))

    val docWords = docs
      .select(col("doc_id"),
        size(split(TextMetrics.normalized(col("text")), " ")).cast("long")
          .as("n_words"))
    spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("span_words").as("dup_words"))
      .join(docWords, "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_spans"), col("dup_words"),
        (col("dup_words").cast("double") / col("n_words").cast("double"))
          .as("dup_frac"))
  }

  def reportSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents
       |), a AS (
       |  SELECT doc_id, CAST(i.i - 1 AS INT) AS pos,
       |         array_to_string(ws[i.i:i.i+${n - 1}], ' ') AS gram
       |  FROM w CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws) - ${n - 1})) AS i) i
       |  WHERE len(ws) >= $n
       |), hot AS (
       |  SELECT gram FROM a GROUP BY 1 HAVING COUNT(*) >= 2
       |), covered AS (
       |  SELECT a.doc_id, a.pos FROM a JOIN hot USING (gram)
       |), flagged AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pme IS NULL OR pos > pme + 1 THEN 1 ELSE 0 END AS new_island
       |  FROM (
       |    SELECT doc_id, pos,
       |           MAX(pos + ${n - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
       |    FROM covered
       |  )
       |), islands AS (
       |  SELECT doc_id, pos,
       |         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM flagged
       |), spans AS (
       |  SELECT doc_id, MAX(pos + ${n - 1}) - MIN(pos) + 1 AS span_words
       |  FROM islands GROUP BY doc_id, island
       |), per_doc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       |         CAST(SUM(span_words) AS BIGINT) AS dup_words
       |  FROM spans GROUP BY 1
       |)
       |SELECT p.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
       |       p.n_spans, p.dup_words,
       |       CAST(p.dup_words AS DOUBLE) / CAST(len(w.ws) AS DOUBLE) AS dup_frac
       |FROM per_doc p JOIN w USING (doc_id)""".stripMargin
}
