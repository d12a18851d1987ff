package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling and dataset splitting — reproducible across
  * runs, engines, and cluster sizes because the randomness is a salted
  * content hash of the row key, not an RNG stream: the same row always
  * lands in the same sample/split no matter how the data is partitioned.
  * This is the property a training pipeline needs for stable train/val
  * membership under re-sharding (Spark's `sample()` is seed-stable only
  * for identical partitioning).
  */
object Sampling {

  /** Uniform [0,1) from a salted md5 of the key (first 8 hex chars). */
  def hashUniform(key: Column, salt: String): Column =
    (conv(substring(md5(concat(lit(salt), lit(":"), key.cast("string"))), 1, 8),
      16, 10).cast("long").cast("double") / 4294967296.0)

  private def hashUniformSql(keyExpr: String, salt: String): String =
    s"CAST(CAST('0x' || substr(md5('$salt' || ':' || CAST($keyExpr AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0"

  /** Per-language stratified document sample (a `sampleBy` with
    * deterministic membership): en kept at 10%, others at 50%.
    */
  def stratifiedDocs(spark: SparkSession, dir: String, salt: String = "s1"): DataFrame = {
    val u = hashUniform(col("doc_id"), salt)
    val keep = when(col("lang") === "en", u < 0.1).otherwise(u < 0.5)
    Tables.documents(spark, dir)
      .filter(keep)
      .select("doc_id", "lang", "source")
  }

  def stratifiedDocsSql(salt: String = "s1"): String = {
    val u = hashUniformSql("doc_id", salt)
    s"""SELECT doc_id, lang, source FROM documents
       |WHERE CASE WHEN lang = 'en' THEN $u < 0.1 ELSE $u < 0.5 END""".stripMargin
  }

  /** The train/val/test assignment column (90/5/5) for any key — single
    * source of truth shared by [[split]] and the repartition-stability
    * spec.
    */
  def splitCol(key: Column, salt: String = "split1"): Column = {
    val u = hashUniform(key, salt)
    when(u < 0.9, "train").when(u < 0.95, "val").otherwise("test")
  }

  /** Train/val/test assignment by hash thresholds (90/5/5). */
  def split(spark: SparkSession, dir: String, salt: String = "split1"): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), splitCol(col("doc_id"), salt).as("split"))

  def splitSql(salt: String = "split1"): String = {
    val u = hashUniformSql("doc_id", salt)
    s"""SELECT doc_id,
       |       CASE WHEN $u < 0.9 THEN 'train'
       |            WHEN $u < 0.95 THEN 'val' ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  /** Mixture construction: per-source keep rates — the up/down-weighting
    * step that turns raw crawls into a training mixture (sources here are
    * tiered by id as a stand-in for measured quality weights; swapping in
    * a real weights table is the same one filter). Membership stays a
    * salted content hash: re-sharding or engine changes cannot move a
    * document in or out of the mixture.
    */
  def mixRate: Column =
    when(expr("CAST(substring(source, 4) AS INT)") < 5, 1.0)
      .when(expr("CAST(substring(source, 4) AS INT)") < 10, 0.5)
      .otherwise(0.2)

  def mixture(spark: SparkSession, dir: String, salt: String = "mix1"): DataFrame =
    Tables.documents(spark, dir)
      .filter(hashUniform(col("doc_id"), salt) < mixRate)
      .select(col("doc_id"), col("source"), mixRate.as("mix_rate"))

  def mixtureSql(salt: String = "mix1"): String = {
    val u = hashUniformSql("doc_id", salt)
    val rate = "CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 1.0 " +
      "WHEN CAST(substr(source, 4) AS INT) < 10 THEN 0.5 ELSE 0.2 END"
    s"""SELECT doc_id, source, CAST($rate AS DOUBLE) AS mix_rate
       |FROM documents WHERE $u < CAST($rate AS DOUBLE)""".stripMargin
  }

  /** Per-source document cap — the crawl-balancing step that stops one
    * domain from dominating the mixture (a handful of boilerplate-heavy
    * domains can be most of a raw crawl). Keeps at most `cap` documents
    * per source, chosen by the same salted content hash as every other
    * membership decision here (stable under re-sharding and engine
    * moves), ranked through the native [[graft.plans.TopKPerKey]]
    * operator: each source streams through an O(cap) heap after one hash
    * shuffle — no per-source sort, and a skewed mega-source costs memory
    * proportional to `cap`, not its row count.
    */
  def sourceQuota(spark: SparkSession, dir: String, cap: Int = 10,
                  salt: String = "quota1"): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        hashUniform(col("doc_id"), salt).as("u"))
    graft.plans.TopK.perKey(spark, docs, Seq("source"),
      // ascending hash = a uniform `cap`-sized sample of each source;
      // doc_id breaks the (never observed, hash-collision) ties
      Seq("u" -> true, "doc_id" -> true), cap)
      .select("doc_id", "source")
  }

  def sourceQuotaSql(cap: Int = 10, salt: String = "quota1"): String = {
    val u = hashUniformSql("doc_id", salt)
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY $u, doc_id) AS rk
       |  FROM documents
       |) WHERE rk <= $cap""".stripMargin
  }

  /** Quality-weighted (importance) sampling — the soft quality filter:
    * each document is kept with probability equal to its quality score,
    * so high-quality docs survive deterministically more often than
    * boilerplate WITHOUT the hard cliff of a threshold. Membership is
    * `hashUniform(doc_id) < quality` — no RNG state, identical under
    * any partitioning, and replayable months later from the same salt.
    * The report carries its own calibration check: `expected_kept` is
    * the decimal-grid sum of the per-doc probabilities, which the
    * realized `n_kept` must track (binomial concentration) — a drifted
    * hash or a broken score shows up as a gap. One narrow scan + one
    * source-grain aggregate; scan-bound at any corpus size.
    */
  def qualityWeighted(spark: SparkSession, dir: String,
                      salt: String = "qw1"): DataFrame = {
    val u = hashUniform(col("doc_id"), salt)
    Tables.documents(spark, dir).select(
      col("source"),
      TextMetrics.qualityScore.as("q"),
      (u < TextMetrics.qualityScore).as("kept"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("q").cast("decimal(18,6)")).as("eq"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        col("eq").cast("double").as("expected_kept"),
        (col("n_kept").cast("double") / col("n_docs")).as("kept_rate"))
  }

  def qualityWeightedSql(salt: String = "qw1"): String = {
    val u = hashUniformSql("doc_id", salt)
    s"""WITH q AS (
       |${TextMetrics.qualitySql}
       |), d AS (
       |  SELECT doc_id, source FROM documents
       |), t AS (
       |  SELECT d.source, q.quality_score AS qs,
       |         CASE WHEN $u < q.quality_score THEN 1 ELSE 0 END AS kept
       |  FROM d JOIN q USING (doc_id)
       |)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(kept) AS BIGINT) AS n_kept,
       |  CAST(SUM(CAST(qs AS DECIMAL(18,6))) AS DOUBLE) AS expected_kept,
       |  CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS kept_rate
       |FROM t GROUP BY 1""".stripMargin
  }
}
