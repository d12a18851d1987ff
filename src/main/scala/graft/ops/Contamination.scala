package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Benchmark-contamination detection — the decontamination step of a
  * pretraining data pipeline (the published practice: flag or drop
  * training documents that share long word n-grams with evaluation
  * data, as done for GPT-3/Gopher-style training sets).
  *
  * Here the "benchmark suite" is the deterministic slice
  * `doc_id % 97 == 0` of `documents` (a stand-in for an external eval
  * set; swapping in a real one is a one-line change to [[evalSet]]).
  * Every other document is scored by the fraction of its distinct word
  * [[n]]-grams that also occur in the eval set.
  *
  * Scale shape: the eval side is tiny at any corpus size (benchmark
  * suites are MBs, the training corpus is TBs), so the n-gram join is a
  * broadcast hash join — the training side streams through in one pass,
  * no shuffle of the corpus n-grams against the eval set. The only
  * corpus-wide shuffle is the per-doc distinct/aggregate, which
  * map-side-combines on doc_id.
  */
object Contamination {

  /** n-gram width: long enough that a match signals copied benchmark
    * text, not vocabulary coincidence (13 is the published norm for
    * natural text; 5 fits this synthetic corpus's 30-word vocabulary
    * and ~60-word documents).
    */
  val n = 5

  /** Deterministic eval-set membership: doc_id % evalMod == 0. */
  val evalMod = 97

  /** Distinct word-n-grams per document (same normalization as the
    * dedup shingles; docs shorter than n words yield none — the
    * `size >= n` guard is required because Spark's `sequence(0, m)`
    * runs DESCENDING for negative m instead of returning empty).
    */
  def ngrams(spark: SparkSession, dir: String): DataFrame =
    // memoized: report() consumes this on BOTH sides of its join (the
    // eval slice and the training corpus) — unmemoized each branch
    // re-runs the scan + explode + distinct shuffle
    graft.Memo(spark, "contam_ngrams", dir, "contam_ngrams") {
      ngramsUncached(spark, dir)
    }

  private def ngramsUncached(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(TextMetrics.normalized(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        graft.functions.WordNgramFunctions
          .wordNgrams(spark, col("ws"), n).as("ngram"))
      .distinct()

  /** Per-training-doc contamination report: distinct-n-gram count,
    * overlap count with the eval set, ratio, and the flag. Eval docs
    * are excluded from the output (they trivially self-overlap).
    */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val ng = ngrams(spark, dir)
    // the doc_id filters push below the explode+distinct to the scan,
    // so the eval branch reads only the eval slice of the corpus
    val evalNg = ng.filter(col("doc_id") % evalMod === 0)
      .select("ngram").distinct().withColumn("hit", lit(1))
    ng.filter(col("doc_id") % evalMod =!= 0)
      .join(Bcast.ifBounded(evalNg, Bcast.QueryBatch), Seq("ngram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_overlap"))
      .select(col("doc_id"), col("n_ngrams"), col("n_overlap"),
        // integer counts → one double division: deterministic IEEE
        // arithmetic, identical across engines (no decimal rounding)
        (col("n_overlap").cast("double") / col("n_ngrams").cast("double"))
          .as("contamination_ratio"),
        (col("n_overlap") > 0).as("contaminated"))
  }

  /** Per-source contamination rollup — which ingestion sources leak the
    * eval set: document counts, contaminated counts, and the n-gram
    * overlap mass aggregated per source. Rides [[report]]'s per-doc
    * frame (memoized n-gram table underneath); one extra source-grain
    * aggregate with map-side combine.
    */
  def bySource(spark: SparkSession, dir: String): DataFrame =
    report(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_contaminated"),
        sum("n_ngrams").as("total_ngrams"),
        sum("n_overlap").as("total_overlap"))
      .select(col("source"), col("n_docs"), col("n_contaminated"),
        col("total_ngrams"), col("total_overlap"),
        (col("n_contaminated").cast("double") / col("n_docs"))
          .as("contaminated_rate"))

  def bySourceSql: String =
    s"""WITH rep AS (
       |$reportSql
       |), s AS (
       |  SELECT doc_id, source FROM documents
       |)
       |SELECT s.source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN rep.contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  CAST(SUM(rep.n_ngrams) AS BIGINT) AS total_ngrams,
       |  CAST(SUM(rep.n_overlap) AS BIGINT) AS total_overlap,
       |  CAST(SUM(CASE WHEN rep.contaminated THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS contaminated_rate
       |FROM rep JOIN s USING (doc_id)
       |GROUP BY 1""".stripMargin

  /** Contaminated docs via a Bloom-prefiltered exact join — the plan for
    * when the eval side outgrows a broadcast hash relation. [[report]]'s
    * broadcast join needs the full eval n-gram set in executor memory as
    * a hash map (~50+ B/entry); a Bloom filter at 1% fpp is ~10
    * bits/item, so an eval set 40× too big to broadcast exactly still
    * ships to every executor as a Bloom. The corpus n-grams are then
    * prefiltered executor-locally (true hits + ~fpp false positives
    * survive), and only that sliver reaches the exact confirm join —
    * which at scale is a shuffle join over the survivors, deliberately
    * NOT broadcast-hinted here (AQE picks broadcast at test SF where the
    * eval side is tiny; at 100 TB it shuffles the post-Bloom sliver, not
    * the corpus). Bloom filters have no false negatives, so the result
    * equals the exact computation row-for-row regardless of fpp — the
    * oracle is the plain exact SQL, nothing probabilistic leaks into the
    * output. The membership probe is the library's codegen'd
    * [[graft.functions.BloomMightContain]] expression (Spark's own
    * `might_contain` is optimizer-internal): the filter ships with the
    * plan and deserializes once per executor, and the probe stays inside
    * whole-stage codegen instead of black-boxing the filter stage behind
    * a UDF.
    */
  def flaggedViaBloom(spark: SparkSession, dir: String, fpp: Double = 0.01): DataFrame = {
    val ng = ngrams(spark, dir)
    val evalNg = ng.filter(col("doc_id") % evalMod === 0)
      .select("ngram").distinct()
    // one eval-slice-scale count to size the filter; at 100 TB this is
    // still benchmark-suite-sized (MBs of text), not corpus-sized
    val bloom = evalNg.stat.bloomFilter("ngram", math.max(evalNg.count(), 1L), fpp)
    ng.filter(col("doc_id") % evalMod =!= 0)
      .filter(graft.functions.BloomMightContain
        .bloomMightContain(spark, col("ngram"), bloom))
      .join(evalNg, Seq("ngram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Corpus-wide repeated n-gram detection — the exact substring-dup
    * signal (the "memorized boilerplate" scan of published
    * training-data dedup work): n-grams occurring in more than one
    * document, ranked by document frequency. Reuses the memoized
    * per-doc distinct n-gram table; one map-side-combined aggregate
    * shuffling (ngram, partial count), then TakeOrdered heaps for the
    * top-k — ties at the boundary break on the n-gram string so the
    * selected set is deterministic.
    */
  def repeatedNgrams(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    ngrams(spark, dir)
      .groupBy("ngram")
      .agg(count(lit(1)).as("doc_freq"), min("doc_id").as("first_doc"))
      .filter(col("doc_freq") > 1)
      .orderBy(col("doc_freq").desc, col("ngram"))
      .limit(k)

  def repeatedNgramsSql(k: Int = 100): String = {
    val terms = (0 until n).map(j => s"ws[i.i+$j]").mkString(" || ' ' || ")
    s"""WITH ng AS (
       |  SELECT DISTINCT doc_id, $terms AS ngram
       |  FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |        FROM documents) w
       |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-${n - 1})) AS i) i
       |)
       |SELECT ngram, COUNT(*) AS doc_freq, MIN(doc_id) AS first_doc
       |FROM ng GROUP BY ngram HAVING COUNT(*) > 1
       |ORDER BY doc_freq DESC, ngram LIMIT $k""".stripMargin
  }

  /** Per-doc novelty: the fraction of a document's distinct n-grams that
    * occur in NO other document — the diversity complement of
    * [[repeatedNgrams]] used to up-weight novel text in curation. Two
    * map-side-combined aggregates over the memoized n-gram table (gram
    * doc-frequency, then per-doc rollup) joined on the gram; integer
    * counts and one double division keep both engines bit-identical.
    */
  def novelty(spark: SparkSession, dir: String): DataFrame = {
    val ng = ngrams(spark, dir)
    val df = ng.groupBy("ngram").agg(count(lit(1)).as("doc_freq"))
    ng.join(df, "ngram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("doc_freq") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_ngrams"), col("n_unique"),
        (col("n_unique").cast("double") / col("n_ngrams").cast("double"))
          .as("novelty_ratio"))
  }

  val noveltySql: String = {
    val terms = (0 until n).map(j => s"ws[i.i+$j]").mkString(" || ' ' || ")
    s"""WITH ng AS (
       |  SELECT DISTINCT doc_id, $terms AS ngram
       |  FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |        FROM documents) w
       |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-${n - 1})) AS i) i
       |), freq AS (
       |  SELECT ngram, COUNT(*) AS doc_freq FROM ng GROUP BY ngram
       |)
       |SELECT ng.doc_id, COUNT(*) AS n_ngrams,
       |       CAST(SUM(CASE WHEN f.doc_freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       |       CAST(SUM(CASE WHEN f.doc_freq = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(COUNT(*) AS DOUBLE) AS novelty_ratio
       |FROM ng JOIN freq f USING (ngram)
       |GROUP BY ng.doc_id""".stripMargin
  }

  // ---------- DuckDB oracle ----------

  val reportSql: String = {
    val terms = (0 until n).map(j => s"ws[i.i+$j]").mkString(" || ' ' || ")
    s"""WITH ng AS (
       |  SELECT DISTINCT doc_id, $terms AS ngram
       |  FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |        FROM documents) w
       |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-${n - 1})) AS i) i
       |), eval_ng AS (
       |  SELECT DISTINCT ngram FROM ng WHERE doc_id % $evalMod = 0
       |)
       |SELECT t.doc_id,
       |  count(*) AS n_ngrams,
       |  count(e.ngram) AS n_overlap,
       |  CAST(count(e.ngram) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination_ratio,
       |  count(e.ngram) > 0 AS contaminated
       |FROM ng t LEFT JOIN eval_ng e ON t.ngram = e.ngram
       |WHERE t.doc_id % $evalMod <> 0
       |GROUP BY 1""".stripMargin
  }

  /** Exact twin of [[flaggedViaBloom]]: the Bloom is an optimization
    * invisible in the output, so the oracle is the plain inner join.
    */
  val flaggedSql: String = {
    val terms = (0 until n).map(j => s"ws[i.i+$j]").mkString(" || ' ' || ")
    s"""WITH ng AS (
       |  SELECT DISTINCT doc_id, $terms AS ngram
       |  FROM (SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |        FROM documents) w
       |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-${n - 1})) AS i) i
       |), eval_ng AS (
       |  SELECT DISTINCT ngram FROM ng WHERE doc_id % $evalMod = 0
       |)
       |SELECT t.doc_id, count(*) AS n_overlap
       |FROM ng t JOIN eval_ng e ON t.ngram = e.ngram
       |WHERE t.doc_id % $evalMod <> 0
       |GROUP BY 1""".stripMargin
  }
}
