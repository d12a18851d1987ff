package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SimHash document fingerprinting: a 60-bit signature whose Hamming
  * distance approximates token-multiset similarity — the numeric cousin
  * of MinHash, used for near-dup candidate generation by fingerprint
  * prefix or Hamming-ball lookup.
  *
  * Token hash = the top 60 bits of md5(token) (15 hex chars → long via
  * `conv`); per bit b the signature accumulates +1/−1 per token occurrence
  * (term frequency weighting), bit set iff the sum is ≥ 0. Single
  * groupBy(doc_id) with 60 conditional-sum aggregates — one shuffle of
  * (doc_id, token-hash) pairs, no UDFs, codegen throughout.
  *
  * Oracle-checked: the 60 conditional sums and the bit assembly are
  * mechanically generated for DuckDB too ([[signaturesSql]] /
  * [[candidatesSql]] — `('0x'‖hex)::BIGINT` parses the top-60-bit token
  * hash, `xor`/`bit_count` compute the Hamming distance), on top of the
  * OpsSpec invariants.
  */
object SimHash {

  val bits = 60

  def signatures(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "simhash_signatures", dir, "simhash_signatures")(signaturesUncached(spark, dir))

  private def signaturesUncached(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(TextMetrics.normalized(col("text")), " ")).as("token"))
      .withColumn("th", conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"))

    val bitSums = (0 until bits).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"s$b")
    }
    val sig = (0 until bits).map { b =>
      shiftleft(when(col(s"s$b") >= 0, 1L).otherwise(0L), b)
    }.reduce(_ + _)

    tokens.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** Near-dup candidates: pairs whose signatures agree on at least one
    * 12-bit band (5 bands — the MinHash-LSH banding idea on Hamming
    * space; smaller bands trade candidate volume for recall).
    */
  def candidates(spark: SparkSession, dir: String): DataFrame = {
    // memo-persisted: the banded self-join below reads this frame twice
    val s = signatures(spark, dir)
    val banded = s.select(col("doc_id"), col("simhash"),
      explode(array((0 until 5).map(b =>
        concat_ws(":", lit(b), shiftright(col("simhash"), b * 12).bitwiseAND(0xFFF))): _*))
        .as("band_key"))
    val a = banded.select(col("band_key"), col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    a.join(
        banded.select(col("band_key"), col("doc_id").as("doc_b"), col("simhash").as("sig_b")),
        Seq("band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
  }

  // ---------- DuckDB oracles ----------

  /** CTE chain ending in `sig(doc_id, simhash)` — the same tokenization
    * as the Spark side (TextMetrics.normalized + split on ' '), the same
    * top-60-bits-of-md5 token hash, the same ±1 bit sums.
    */
  private val sigCte: String = {
    val bitSums = (0 until bits)
      .map(b => s"SUM(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val assemble = (0 until bits)
      .map(b => s"(CASE WHEN s$b >= 0 THEN 1::BIGINT ELSE 0::BIGINT END << $b)")
      .mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id,
       |         unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS token
       |  FROM documents
       |), th AS (
       |  SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS th FROM toks
       |), bitsums AS (
       |  SELECT doc_id, $bitSums FROM th GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, $assemble AS simhash FROM bitsums
       |)""".stripMargin
  }

  val signaturesSql: String =
    s"WITH $sigCte SELECT doc_id, simhash FROM sig"

  val candidatesSql: String =
    s"""WITH $sigCte, banded AS (
       |  SELECT doc_id, simhash, CAST(b.b AS INT) AS band,
       |         (simhash >> (CAST(b.b AS INT) * 12)) & 4095 AS bandval
       |  FROM sig, range(0, 5) b(b)
       |)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bandval = b.bandval AND a.doc_id < b.doc_id""".stripMargin
}
