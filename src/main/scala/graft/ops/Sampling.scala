package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

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

  /** Temperature-scaled source mixing (the multilingual-LM standard:
    * sample source s with probability ∝ p_s^α, α < 1 flattening the raw
    * token distribution so head sources are down-weighted and tail
    * sources up-weighted — Devlin et al.'s mBERT exponentiated smoothing
    * / Conneau & Lample XLM §3.1, public technique). α is fixed at 0.5 so
    * the power is `sqrt`, IEEE-correctly-rounded and therefore
    * bit-identical across engines; the cross-source normalizer sums on a
    * DECIMAL(18,6) grid (order-free), and the final per-source rate is
    * rounded to DECIMAL(12,8) before any membership comparison — the
    * 2^-32-granular content hash cannot sit on a boundary.
    *
    * Output per source: raw share `p_raw`, temperature weight, the
    * sampling rate that hits a 30%-of-corpus token budget
    * (`min(1, w_s·B/n_s)`), and realized-vs-expected kept counts (the
    * same calibration self-check as [[qualityWeighted]]).
    *
    * Scale: one narrow scan computes per-doc token counts; everything
    * after the source-grain aggregate is O(sources). Membership stays a
    * salted content hash — re-sharding cannot move a document in or out
    * of the mixture, so the mixture is reproducible months later from
    * (salt, α, budget) alone. The one-row totals crossJoin is broadcast
    * (PlanLint-allowlisted).
    */
  def temperatureMixture(spark: SparkSession, dir: String,
                         budgetFrac: Double = 0.3,
                         salt: String = "temp1"): DataFrame = {
    // functions.split is shadowed by this object's train/val/test `split`
    val norm = TextMetrics.normalized(col("text"))
    val nToks = size(filter(
      org.apache.spark.sql.functions.split(norm, " "),
      t => length(t) > 0)).cast("long")
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"), nToks.as("n_toks"),
      hashUniform(col("doc_id"), salt).as("u"))
    val bySrc = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
      .withColumn("sq", sqrt(col("n_tokens").cast("double")).cast("decimal(18,6)"))
    val totals = bySrc.agg(
      sum("n_tokens").as("tot_tokens"), sum("sq").as("tot_sq"))
    val rated = bySrc.crossJoin(Bcast.ifBounded(totals, Bcast.OneRow)).select(
      col("source"), col("n_docs"), col("n_tokens"),
      (col("n_tokens").cast("double") / col("tot_tokens").cast("double")).as("p_raw"),
      (col("sq").cast("double") / col("tot_sq").cast("double")).as("weight"),
      least(lit(1.0),
        col("sq").cast("double") / col("tot_sq").cast("double") * lit(budgetFrac)
          * col("tot_tokens").cast("double") / col("n_tokens").cast("double"))
        .cast("decimal(12,8)").as("rate_dec"))
    docs.join(Bcast.ifBounded(rated, Bcast.Domain), "source")
      .groupBy("source")
      .agg(first("n_docs").as("n_docs"), first("n_tokens").as("n_tokens"),
        first("p_raw").as("p_raw"), first("weight").as("weight"),
        first(col("rate_dec").cast("double")).as("sample_rate"),
        sum(when(col("u") < col("rate_dec").cast("double"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("u") < col("rate_dec").cast("double"), col("n_toks"))
          .otherwise(0L)).as("kept_tokens"))
  }

  def temperatureMixtureSql(budgetFrac: Double = 0.3,
                            salt: String = "temp1"): String = {
    val u = hashUniformSql("doc_id", salt)
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(
       |           string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
       |           t -> t <> '')) AS BIGINT) AS n_toks,
       |         $u AS u
       |  FROM documents
       |), by_src AS (
       |  SELECT source, COUNT(*) AS n_docs, SUM(n_toks) AS n_tokens,
       |         CAST(sqrt(CAST(SUM(n_toks) AS DOUBLE)) AS DECIMAL(18,6)) AS sq
       |  FROM d GROUP BY 1
       |), totals AS (
       |  SELECT SUM(n_tokens) AS tot_tokens, SUM(sq) AS tot_sq FROM by_src
       |), rated AS (
       |  SELECT source, n_docs, n_tokens,
       |         CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS p_raw,
       |         CAST(sq AS DOUBLE) / CAST(tot_sq AS DOUBLE) AS weight,
       |         CAST(LEAST(1.0,
       |           CAST(sq AS DOUBLE) / CAST(tot_sq AS DOUBLE) * $budgetFrac
       |             * CAST(tot_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))
       |           AS DECIMAL(12,8)) AS rate_dec
       |  FROM by_src, totals
       |)
       |SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs,
       |       CAST(r.n_tokens AS BIGINT) AS n_tokens, r.p_raw, r.weight,
       |       CAST(r.rate_dec AS DOUBLE) AS sample_rate,
       |       CAST(SUM(CASE WHEN d.u < CAST(r.rate_dec AS DOUBLE)
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(SUM(CASE WHEN d.u < CAST(r.rate_dec AS DOUBLE)
       |                THEN d.n_toks ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM d JOIN rated r USING (source)
       |GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin
  }

  /** Deterministic multi-epoch training-order shuffle — the "global
    * shuffle" step that turns a curated corpus into per-epoch reader
    * shards: each (epoch, doc) gets a salted content-hash order key, the
    * top ⌈log₂⌉ bits of which pick the shard and the rest the position
    * within it. Properties a trainer needs, all by construction:
    * reproducible (same salt → same order on any engine/partitioning),
    * epoch-decorrelated (the epoch is inside the hash, so each epoch is
    * an independent permutation), and shard-local (a reader consumes one
    * shard sequentially; no global sort ever runs — the rank window
    * partitions by (epoch, shard), each ≈ corpus/shards rows, the shard
    * count chosen at production scale so a shard fits a reader. For
    * corpora where even one shard's rank exceeds a partition, the
    * two-tier prefix-sum of [[Pack.pack]] applies unchanged).
    */
  def epochShuffle(spark: SparkSession, dir: String, epochs: Int = 2,
                   shards: Int = 8, salt: String = "ep1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = hashUniform(
      concat(col("epoch").cast("string"), lit("_"), col("doc_id").cast("string")),
      salt)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("u", u)
      .withColumn("shard", floor(col("u") * shards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard").orderBy(col("u"), col("doc_id"))))
      .select("epoch", "shard", "pos", "doc_id")
  }

  def epochShuffleSql(epochs: Int = 2, shards: Int = 8,
                      salt: String = "ep1"): String = {
    val u = hashUniformSql(
      "CAST(epoch AS VARCHAR) || '_' || CAST(doc_id AS VARCHAR)", salt)
    s"""WITH e AS (
       |  SELECT doc_id, CAST(i.range AS INT) AS epoch
       |  FROM documents CROSS JOIN range(0, $epochs) i
       |), h AS (
       |  SELECT doc_id, epoch, $u AS u FROM e
       |)
       |SELECT epoch, CAST(floor(u * $shards) AS INT) AS shard,
       |       CAST(row_number() OVER (
       |         PARTITION BY epoch, CAST(floor(u * $shards) AS INT)
       |         ORDER BY u, doc_id) AS INT) AS pos,
       |       doc_id
       |FROM h""".stripMargin
  }

  /** Weighted sampling WITHOUT replacement via the Efraimidis–Spirakis
    * exponential-key scheme (Inf. Proc. Letters 2006 — public
    * algorithm): each doc draws key `u^(1/w)` and the sample is the
    * global top-k keys — one pass, no rejection loop, no sequential
    * state, which is what makes weighted no-replacement sampling
    * distributable at all. Ranked on the order-equivalent `ln(u)/w`
    * (avoids pow); u is the deterministic salted-hash uniform shared by
    * the whole sampling family, so membership is reproducible and the
    * oracle replays the identical arithmetic. Weight = ln(1+n_chars):
    * longer docs are proportionally likelier, never certain. The top-k
    * rides the native heap operator — no total-order shuffle.
    */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 200,
                     salt: String = "es1"): DataFrame = {
    val w = log(lit(1.0) + col("n_chars").cast("double"))
    val esKey = log(hashUniform(col("doc_id"), salt)) / w
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), esKey.as("es_key"))
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  def weightedSampleSql(k: Int = 200, salt: String = "es1"): String = {
    val u = hashUniformSql("doc_id", salt)
    s"""SELECT doc_id, n_chars FROM (
       |  SELECT doc_id, n_chars,
       |         ln($u) / ln(1 + CAST(n_chars AS DOUBLE)) AS es_key
       |  FROM documents
       |  ORDER BY es_key DESC, doc_id LIMIT $k) t
       |ORDER BY doc_id""".stripMargin
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
