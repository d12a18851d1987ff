package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.col

/** Corpus-size-derived ANN knobs. Hard-coded constants (8 planes, 16
  * centroids) are a scale bug: fixed plane count makes sign-LSH buckets
  * grow O(n) — the within-bucket refine becomes a cartesian in disguise —
  * and a fixed centroid count makes each IVF probe scan O(n). Deriving
  * both from the corpus size keeps the candidate sets bounded at any
  * scale, and the DuckDB oracles compute the SAME formulas from
  * `count(*)` (integer / correctly-rounded-IEEE ops only, so the two
  * engines cannot round apart):
  *
  *  - sign-LSH planes = max(8, ⌈log₂(⌈n / targetBucket⌉)⌉) → expected
  *    bucket size ≈ targetBucket regardless of n (2000 vecs → 8 planes;
  *    10¹⁰ vecs → 27 planes / 1.3e8 buckets).
  *  - IVF centroids = max(16, ⌈√(n/4)⌉) → list size and centroid scan
  *    stay balanced (√-law); a probe reads nProbe·√n vectors, not n/16.
  *
  * The ⌈log₂⌉ is computed with integer bit ops (`numberOfLeadingZeros`
  * here, `length(bin(m−1))` in DuckDB) rather than floating log2, whose
  * ulp could straddle the ceiling boundary differently per engine.
  */
object AnnParams {

  /** Expected sign-LSH bucket occupancy the plane count targets. */
  val targetBucket = 128

  // corpus size is a pure data property → keyed by dir, shared across
  // sessions; one parquet-metadata count per dir per JVM. Same staleness
  // policy as Memo: if a dir's data is REWRITTEN in-process, the cached
  // size (and so the plane/centroid knobs) silently reflects the old
  // corpus — acceptable because test dirs are immutable; a mutable
  // deployment would key by (dir, snapshot/commit id) instead.
  private val sizes = TrieMap.empty[String, Long]

  def corpusSize(spark: SparkSession, dir: String): Long =
    sizes.getOrElseUpdate(dir, graft.Tables.embeddings(spark, dir).count())

  /** Corpus size for an arbitrary vector corpus — keyed by
    * (dir, corpus.countTable) so derived corpora get their own knobs.
    */
  def corpusSizeOf(spark: SparkSession, dir: String,
                   corpus: Similarity.VecCorpus): Long =
    sizes.getOrElseUpdate(s"$dir#${corpus.countTable}",
      corpus.countOf(spark, dir))

  /** ⌈log₂ m⌉ for m ≥ 1, in exact integer arithmetic. */
  def ceilLog2(m: Long): Int =
    if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)

  def numPlanes(n: Long): Int =
    math.max(8, ceilLog2((n + targetBucket - 1) / targetBucket))

  def nCentroids(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n / 4.0)).toInt)

  /** IVF probe count = ⌈3·nc/4⌉, scaled like the other knobs (integer
    * ceil of a fixed fraction of the centroid count — no floating point,
    * so the SQL twin cannot round apart). A fixed probe COUNT would make
    * the probed fraction shrink with the corpus and recall decay
    * unmeasured (the r4 state: fixed 4); a fixed FRACTION holds the
    * measured recall level as n grows. The fraction is calibrated by
    * RecallSweep on this corpus: recall@10 = 0.63 at nc/4 probes, 0.92
    * at 3nc/4 (sf0.01, n=500), 0.91 at 3nc/4 (sf0.1, n=2000) — the
    * embeddings are isotropic-random (max pairwise cosine ≈ 0.5, no
    * cluster structure), which is IVF's worst case: true neighbors
    * scatter across lists, so ≥0.9 recall genuinely requires most of
    * them. On real-world clustered embeddings the same ≥0.9 target is
    * met at a far smaller fraction — the point of the knob is that the
    * recall/cost trade is now a measured, corpus-scaled dial instead of
    * a silent constant. Measured on the clustered fixture
    * (ClusteredIvfSpec / SCALE.md): the same ≥0.9 target is met at
    * ≤ 1/4 of the lists — the 3/4 here is the isotropic-corpus
    * calibration of that dial, not a universal cost.
    */
  def nProbe(n: Long): Int = math.max(4, (3 * nCentroids(n) + 3) / 4)

  /** Fixed cap on the retrieval-measurement query sample. The ground
    * truth (brute-force top-k) is quadratic PER QUERY by construction; a
    * measurement harness may be quadratic in a fixed sample, never in the
    * corpus. `vec_id % queryMod = 0 AND vec_id < queryMod·maxQueries`
    * admits the LOWEST maxQueries query ids — deterministic, and
    * expressible identically in SQL. At the test SFs (≤ 2,000 vectors,
    * ≤ 40 queries) the cap never binds, so results are unchanged; at
    * scale the truth cost is O(maxQueries · n) instead of O(n²/mod).
    */
  val maxQueries = 1000

  /** The measurement query-set predicate every retrieval path shares —
    * truth and approximate methods MUST select the same sample or recall
    * numerators and denominators drift apart.
    */
  def queryPred(queryMod: Int): Column =
    col("vec_id") % queryMod === 0 &&
      col("vec_id") < queryMod.toLong * maxQueries

  /** SQL twin of [[queryPred]] (prefix the column when ambiguous). */
  def queryPredSql(queryMod: Int, c: String = "vec_id"): String =
    s"$c % $queryMod = 0 AND $c < ${queryMod.toLong * maxQueries}"

  /** SQL twin of [[numPlanes]] over the embeddings table. */
  val numPlanesSql: String =
    s"""ann_params AS MATERIALIZED (
       |  SELECT GREATEST(8, CASE WHEN m <= 1 THEN 0 ELSE length(bin(m - 1)) END) AS nplanes
       |  FROM (SELECT (count(*) + ${targetBucket - 1}) // $targetBucket AS m FROM embeddings)
       |)""".stripMargin

  /** SQL twin of [[nCentroids]] over an arbitrary knob table. */
  def nCentroidsSqlFor(table: String): String =
    s"""ivf_params AS MATERIALIZED (
       |  SELECT GREATEST(16, CAST(CEIL(SQRT(count(*) / 4.0)) AS INT)) AS nc
       |  FROM $table
       |)""".stripMargin

  /** SQL twin of [[nCentroids]] over the embeddings table. */
  val nCentroidsSql: String = nCentroidsSqlFor("embeddings")

  /** SQL twin of [[nProbe]]; requires `ivf_params` in scope. */
  val nProbeSql: String =
    "nprobe_params AS MATERIALIZED (SELECT GREATEST(4, (3 * nc + 3) // 4) AS np FROM ivf_params)"
}
