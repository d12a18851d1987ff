package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Winnowing-fingerprint dedup over `documents` — the rolling-hash
  * counterpart to MinHash: shared substrings ≥ k+w−1 chars guarantee
  * shared fingerprints, so containment of fingerprint sets detects
  * near-dup / partial-overlap documents (plagiarism-detector semantics).
  *
  * Scale shape: fingerprints per doc ≈ 2·len/w (sub-linear in w); the
  * pair generation is an equi-join on individual fingerprint values —
  * bounded by posting-list sizes like the LSH band join, never all-pairs.
  */
object Winnow {

  // corpus size is a pure data property → keyed by dir, one count per JVM
  // (same staleness caveat as AnnParams.corpusSize: a corpus rewritten
  // under the same path in-process reuses the old knob)
  private val docCounts = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Posting-list doc-freq cap = max(50, ⌈50·(n/500)^¼⌉), n = corpus doc
    * count. A FIXED cap silently drops genuine near-dup families larger
    * than it from candidate generation once the corpus outgrows the test
    * SF (50 was tuned at n=500); the quarter-power growth keeps the
    * worst-case pair fan-out per fingerprint (cap²) at O(√(n/500)) —
    * sublinear in n — while admitting ever-larger true-dup families.
    * Computed as sqrt∘sqrt, not pow(…, 0.25): IEEE requires sqrt to be
    * correctly rounded (pow isn't), so the SQL twin cannot round apart.
    */
  def docFreqCap(spark: SparkSession, dir: String): Int = {
    val n = docCounts.getOrElseUpdate(dir,
      Tables.documents(spark, dir).count())
    math.max(50, math.ceil(50.0 * math.sqrt(math.sqrt(n / 500.0))).toInt)
  }

  /** SQL twin of [[docFreqCap]] over the documents table. */
  val docFreqCapSql: String =
    """wparams AS (
      |  SELECT GREATEST(50, CAST(CEIL(50.0 * SQRT(SQRT(count(*) / 500.0))) AS INT)) AS cap
      |  FROM documents
      |)""".stripMargin

  /** (doc_id, fingerprints array<long>) via the custom expression. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "winnow_fingerprints", dir, "winnow_fingerprints") {
      Tables.documents(spark, dir).select(
        col("doc_id"),
        GraftFunctions.winnowFingerprint(spark,
          TextMetrics.normalized(col("text"))).as("fingerprints"))
    }

  /** Driver-check projection of [[fingerprints]]: the raw `array<long>`
    * crashes the comparator's pandas sort, so the registered query emits
    * per-doc scalars — count + md5 over the sorted fingerprint list —
    * oracle-checked against [[fingerprintsCheckSql]].
    */
  def fingerprintsCheck(spark: SparkSession, dir: String): DataFrame =
    fingerprints(spark, dir).select(
      col("doc_id"),
      size(col("fingerprints")).as("n_fingerprints"),
      md5(concat_ws(",", transform(col("fingerprints"), _.cast("string"))))
        .as("fp_digest"))

  /** Candidate pairs by shared-fingerprint containment ≥ `threshold`
    * (containment = |A∩B| / min(|A|,|B|)). `maxDocFreq` ≤ 0 → the
    * corpus-scaled [[docFreqCap]].
    */
  def nearDups(spark: SparkSession, dir: String,
               threshold: Double = 0.5, maxDocFreq: Int = 0): DataFrame = {
    val cap = if (maxDocFreq > 0) maxDocFreq else docFreqCap(spark, dir)
    val fp = fingerprints(spark, dir)
      .select(col("doc_id"), col("fingerprints"),
        size(col("fingerprints")).as("n"))
    val postingAll = fp.select(col("doc_id"), col("n"),
      explode(col("fingerprints")).as("f"))
    // Posting-list pruning: a fingerprint present in d docs yields d² pair
    // rows, so stop-fingerprints (common phrases) make the join
    // quasi-cartesian while carrying no near-dup signal. Cap doc-freq.
    val rare = postingAll.groupBy("f")
      .agg(count(lit(1)).as("df")).filter(col("df") <= cap)
      .select("f")
    val posting = postingAll.join(rare, Seq("f"))
    val a = posting.select(col("f"), col("doc_id").as("doc_a"), col("n").as("na"))
    val b = posting.select(col("f"), col("doc_id").as("doc_b"), col("n").as("nb"))
    a.join(b, Seq("f"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("shared"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") / least(col("na"), col("nb")).cast("double"))
          .grid6.as("containment"))
      .filter(col("containment") >= threshold)
  }

  // ---------- DuckDB oracles ----------
  //
  // The mod-2⁶⁴ polynomial rolling hash IS SQL-expressible after all: not
  // as the iterated recurrence (BIGINT overflow is an error in DuckDB,
  // not a wrap), but as the direct k-term sum
  // h(p) = Σⱼ byte(p+j)·257^(k−1−j) (mod 2⁶⁴) in HUGEINT arithmetic —
  // ≤ 2⁷⁶ before the final modulo, comfortably inside int128. The
  // winnowing window-min then falls out of a row_number over (h ASC,
  // pos DESC) — ORDER BY on the 0..2⁶⁴−1 HUGEINT is exactly the unsigned
  // comparison the Scala side does, and pos DESC keeps the RIGHTMOST
  // minimum. Only at the end is each hash wrapped to Spark's signed Long.
  // (The corpus is ASCII, so ascii(char) == UTF-8 byte.)

  /** CTE chain ending in `fps(doc_id, f BIGINT)` — the distinct signed
    * fingerprints per document, matching [[WinnowUtil.fingerprint]].
    */
  private def fpsCte(k: Int, w: Int): String = {
    val two64 = BigInt(2).pow(64)
    val terms = (0 until k).map { j =>
      val pow = BigInt(257).modPow(BigInt(k - 1 - j), two64)
      s"CAST(ascii(substr(norm, CAST(p.p AS INT) + $j, 1)) AS HUGEINT) * $pow::HUGEINT"
    }.mkString(" +\n           ")
    s"""wnorm AS (
       |  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
       |  FROM documents
       |), kg AS (
       |  SELECT doc_id, CAST(p.p AS INT) - 1 AS g,
       |         ($terms) % 18446744073709551616::HUGEINT AS h
       |  FROM wnorm CROSS JOIN LATERAL
       |    (SELECT unnest(generate_series(1, CAST(length(norm) AS INT) - $k + 1)) AS p) p
       |), nk AS (
       |  SELECT doc_id, count(*) AS n FROM kg GROUP BY doc_id
       |), sel AS (
       |  SELECT doc_id, s, h FROM (
       |    SELECT kg.doc_id, s.s, kg.h,
       |           row_number() OVER (PARTITION BY kg.doc_id, s.s
       |                              ORDER BY kg.h ASC, kg.g DESC) AS rk
       |    FROM kg JOIN nk USING (doc_id) CROSS JOIN LATERAL
       |      (SELECT unnest(generate_series(0, CAST(GREATEST(nk.n - $w, 0) AS INT))) AS s) s
       |    WHERE kg.g >= s.s AND kg.g < s.s + $w
       |  ) WHERE rk = 1
       |), fps AS (
       |  SELECT DISTINCT doc_id,
       |         CASE WHEN h >= 9223372036854775808::HUGEINT
       |              THEN CAST(h - 18446744073709551616::HUGEINT AS BIGINT)
       |              ELSE CAST(h AS BIGINT) END AS f
       |  FROM sel
       |)""".stripMargin
  }

  def fingerprintsCheckSql(k: Int = 12, w: Int = 8): String =
    s"""WITH ${fpsCte(k, w)}, agg AS (
       |  SELECT doc_id, count(*) AS nf,
       |         string_agg(CAST(f AS VARCHAR), ',' ORDER BY f) AS joined
       |  FROM fps GROUP BY doc_id
       |)
       |SELECT d.doc_id, CAST(COALESCE(a.nf, 0) AS INT) AS n_fingerprints,
       |       md5(COALESCE(a.joined, '')) AS fp_digest
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  def nearDupsSql(threshold: Double = 0.5,
                  k: Int = 12, w: Int = 8): String =
    s"""WITH ${fpsCte(k, w)}, $docFreqCapSql, sizes AS (
       |  SELECT doc_id, count(*) AS n FROM fps GROUP BY doc_id
       |), rare AS (
       |  SELECT f FROM fps GROUP BY f HAVING count(*) <= (SELECT cap FROM wparams)
       |), pr AS (
       |  SELECT fps.doc_id, fps.f FROM fps JOIN rare USING (f)
       |), pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM pr a JOIN pr b ON a.f = b.f AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b, CAST(containment AS DOUBLE) AS containment FROM (
       |  SELECT p.doc_a, p.doc_b,
       |         floor((CAST(p.shared AS DOUBLE) / LEAST(na.n, nb.n)
       |) * 1e6 + 0.5) / 1e6 AS containment
       |  FROM pairs p
       |  JOIN sizes na ON na.doc_id = p.doc_a
       |  JOIN sizes nb ON nb.doc_id = p.doc_b
       |) WHERE containment >= $threshold""".stripMargin
}
