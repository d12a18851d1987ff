package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

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
  // sessions; one parquet-metadata count per dir per JVM
  private val sizes = TrieMap.empty[String, Long]

  def corpusSize(spark: SparkSession, dir: String): Long =
    sizes.getOrElseUpdate(dir, graft.Tables.embeddings(spark, dir).count())

  /** ⌈log₂ m⌉ for m ≥ 1, in exact integer arithmetic. */
  def ceilLog2(m: Long): Int =
    if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)

  def numPlanes(n: Long): Int =
    math.max(8, ceilLog2((n + targetBucket - 1) / targetBucket))

  def nCentroids(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n / 4.0)).toInt)

  /** SQL twin of [[numPlanes]] over the embeddings table. */
  val numPlanesSql: String =
    s"""ann_params AS (
       |  SELECT GREATEST(8, CASE WHEN m <= 1 THEN 0 ELSE length(bin(m - 1)) END) AS nplanes
       |  FROM (SELECT (count(*) + ${targetBucket - 1}) // $targetBucket AS m FROM embeddings)
       |)""".stripMargin

  /** SQL twin of [[nCentroids]] over the embeddings table. */
  val nCentroidsSql: String =
    """ivf_params AS (
      |  SELECT GREATEST(16, CAST(CEIL(SQRT(count(*) / 4.0)) AS INT)) AS nc
      |  FROM embeddings
      |)""".stripMargin
}
