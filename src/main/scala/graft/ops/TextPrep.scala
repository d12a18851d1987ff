package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Training-data preparation operators: chunking, vocabulary building,
  * and embedding quantization — the steps between "clean corpus" and
  * "training shards".
  */
object TextPrep {

  /** Split documents into fixed-size word chunks with overlap — the LLM
    * context-window packing primitive. Pure column ops: word array →
    * stride sequence → slice+join per chunk; one narrow pass, no shuffle.
    */
  def chunks(spark: SparkSession, dir: String,
             chunkWords: Int = 64, overlap: Int = 16): DataFrame = {
    val stride = chunkWords - overlap
    val ws = split(TextMetrics.normalized(col("text")), " ")
    Tables.documents(spark, dir)
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            floor(greatest((size(col("ws")) - overlap - 1), lit(0)) / stride).cast("int")),
          i => concat_ws(" ", slice(col("ws"), i * stride + 1, lit(chunkWords))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
      .filter(length(col("chunk_text")) > 0)
      .withColumn("chunk_words",
        size(split(col("chunk_text"), " ")))
  }

  def chunksSql(chunkWords: Int = 64, overlap: Int = 16): String = {
    val stride = chunkWords - overlap
    s"""WITH w AS (
       |  SELECT doc_id,
       |         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents
       |), ch AS (
       |  SELECT doc_id, CAST(i.i AS INT) AS chunk_idx,
       |         array_to_string(ws[(i.i * $stride + 1):(i.i * $stride + $chunkWords)], ' ') AS chunk_text
       |  FROM w CROSS JOIN LATERAL (
       |    SELECT unnest(generate_series(0,
       |      GREATEST(len(ws) - $overlap - 1, 0) // $stride)) AS i) i
       |)
       |SELECT doc_id, chunk_idx, chunk_text,
       |       CAST(len(string_split(chunk_text, ' ')) AS INT) AS chunk_words
       |FROM ch WHERE length(chunk_text) > 0""".stripMargin
  }

  /** Corpus vocabulary: token → term frequency + document frequency.
    * One explode + one aggregation; the shuffle key is the token.
    */
  def vocabulary(spark: SparkSession, dir: String, minCount: Long = 2): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(TextMetrics.normalized(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("term_freq"),
        count_distinct(col("doc_id")).as("doc_freq"))
      .filter(col("term_freq") >= minCount)

  def vocabularySql(minCount: Long = 2): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS token
       |  FROM documents
       |)
       |SELECT token, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
       |FROM toks WHERE length(token) > 0
       |GROUP BY token HAVING COUNT(*) >= $minCount""".stripMargin

  /** TF-IDF over the corpus vocabulary: tf · ln(N/df) per (doc, token).
    * Two aggregations (token df, per-doc tf) joined on the token — the
    * join side carrying df is vocabulary-sized and broadcasts.
    */
  def tfIdf(spark: SparkSession, dir: String, minCount: Long = 2): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.count().toDouble
    // tf is the shared base: both the per-doc counts and the doc-freq
    // rollup derive from it, so the text is normalized/exploded ONCE
    // (df-from-tf = count of docs per token, identical to counting
    // distinct doc_ids in the raw token stream)
    val tf = docs
      .select(col("doc_id"),
        explode(split(TextMetrics.normalized(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .persist()
    val df = tf.groupBy("token")
      .agg(count(lit(1)).as("doc_freq"), sum("tf").as("term_freq"))
      .filter(col("term_freq") >= minCount)
      .select("token", "doc_freq")
    tf.join(Bcast.ifBounded(df, Bcast.Linear), "token")
      .select(col("doc_id"), col("token"), col("tf"),
        (col("tf").cast("double") * log(lit(n) / col("doc_freq").cast("double")))
          .cast("decimal(18,6)").as("tfidf"))
  }

  def tfIdfSql(minCount: Long = 2): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS token
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf FROM toks
       |  WHERE length(token) > 0 GROUP BY 1, 2
       |), vocab AS (
       |  SELECT token, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS term_freq
       |  FROM toks WHERE length(token) > 0
       |  GROUP BY token HAVING COUNT(*) >= $minCount
       |), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
       |SELECT tf.doc_id, tf.token, tf.tf,
       |       CAST(CAST(CAST(tf.tf AS DOUBLE) * ln(n.n / CAST(vocab.doc_freq AS DOUBLE))
       |            AS DECIMAL(18,6)) AS DOUBLE) AS tfidf
       |FROM tf JOIN vocab USING (token), n""".stripMargin

  /** Pack chunks into training shards of ≈`shardWords` words, per source
    * group (the partition key keeps the running sum parallel — a single
    * global ordering would funnel everything through one task).
    */
  def shards(spark: SparkSession, dir: String, shardWords: Int = 2000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy("doc_id", "chunk_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .withColumn("cum_words", sum(col("chunk_words")).over(w))
      .select(col("source"), col("doc_id"), col("chunk_idx"), col("chunk_words"),
        floor((col("cum_words") - col("chunk_words")) / shardWords)
          .cast("int").as("shard_id"))
  }

  def shardsSql(shardWords: Int = 2000): String =
    s"""WITH ch AS (${chunksSql()}),
       |joined AS (
       |  SELECT d.source, c.doc_id, c.chunk_idx, c.chunk_words
       |  FROM ch c JOIN documents d USING (doc_id)
       |)
       |SELECT source, doc_id, chunk_idx, chunk_words,
       |       CAST(FLOOR((SUM(chunk_words) OVER (
       |              PARTITION BY source ORDER BY doc_id, chunk_idx
       |              ROWS UNBOUNDED PRECEDING) - chunk_words) / $shardWords) AS INT) AS shard_id
       |FROM joined""".stripMargin

  /** BPE-style merge-candidate scan: count adjacent token pairs across
    * the corpus and rank the top-k — the inner loop of byte-pair-encoding
    * vocabulary training, lifted to word level. One explode + one
    * map-side-combined aggregation shuffling only (pair, partial count);
    * the top-k runs as TakeOrderedAndProject (per-partition heaps, no
    * global sort). Ties at the k boundary break on the pair string, so
    * the selected SET is deterministic across engines.
    */
  def bpePairs(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val ws = split(TextMetrics.normalized(col("text")), " ")
    Tables.documents(spark, dir)
      .select(ws.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(graft.functions.WordNgramFunctions.wordNgrams(spark, col("ws"), 2).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(k)
  }

  def bpePairsSql(k: Int = 100): String =
    s"""WITH w AS (
       |  SELECT string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents
       |), p AS (
       |  SELECT ws[i.i] || ' ' || ws[i.i+1] AS pair
       |  FROM w CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) i
       |  WHERE len(ws) >= 2
       |)
       |SELECT pair, count(*) AS pair_count FROM p
       |GROUP BY pair ORDER BY pair_count DESC, pair LIMIT $k""".stripMargin

  /** Pointwise mutual information over adjacent token pairs (Church &
    * Hanks 1990 — the classic collocation/phrase-detection statistic;
    * word2vec's word2phrase pass is the same score with a discount).
    * PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) from the bigram
    * table and p(·) from the unigram table — high-PMI pairs are the
    * multi-word expressions a tokenizer should fuse and a dedup shingle
    * should not split.
    *
    * Plan shape: one token explode feeds BOTH count tables (unigram and
    * bigram aggregates are map-side combined), the two totals are
    * ONE-ROW broadcasts, and the unigram joins run on the bigram table
    * AFTER the `minCount` filter — at 100 TB the joined stream is the
    * (Zipf-truncated) frequent-pair set, not the corpus. The one `ln`
    * rides the same cross-engine contract as [[bm25]]/the HLL estimator,
    * and lands on the 1e-6 grid (`grid6` — bit-identical IEEE rounding in
    * both engines) before ranking, so both engines
    * select the same top-k set (ties at the boundary break on the pair
    * string).
    */
  def pmi(spark: SparkSession, dir: String,
          minCount: Long = 5, k: Int = 50): DataFrame = {
    val ws = split(TextMetrics.normalized(col("text")), " ")
    val toks = Tables.documents(spark, dir).select(ws.as("ws"))
    val uni = toks.select(explode(col("ws")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_tok"))
    val pairs = toks.filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("a"),
          element_at(col("ws"), i + 2).as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val big = pairs.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val uTot = uni.agg(sum("n_tok").as("n_tokens"))
    val bTot = big.agg(sum("n_ab").as("n_bigrams"))
    val pmiCol = log(
      (col("n_ab").cast("double") * col("n_tokens") * col("n_tokens")) /
        (col("n_bigrams").cast("double") * col("n_a") * col("n_b")))
      .grid6
    big.filter(col("n_ab") >= minCount)
      .join(uni.select(col("token").as("a"), col("n_tok").as("n_a")), "a")
      .join(uni.select(col("token").as("b"), col("n_tok").as("n_b")), "b")
      .crossJoin(Bcast.ifBounded(uTot, Bcast.OneRow)).crossJoin(Bcast.ifBounded(bTot, Bcast.OneRow))
      .select(concat_ws(" ", col("a"), col("b")).as("pair"),
        col("n_ab").as("pair_count"), pmiCol.as("pmi"))
      .orderBy(col("pmi").desc, col("pair")).limit(k)
  }

  def pmiSql(minCount: Long = 5, k: Int = 50): String =
    s"""WITH w AS (
       |  SELECT string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents
       |), uni AS (
       |  SELECT token, COUNT(*) AS n_tok FROM (
       |    SELECT unnest(ws) AS token FROM w
       |  ) GROUP BY 1
       |), p AS (
       |  SELECT ws[i.i] AS a, ws[i.i+1] AS b
       |  FROM w CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) i
       |  WHERE len(ws) >= 2
       |), big AS (
       |  SELECT a, b, COUNT(*) AS n_ab FROM p GROUP BY 1, 2
       |), t AS (SELECT SUM(n_tok) AS n_tokens FROM uni),
       |bt AS (SELECT SUM(n_ab) AS n_bigrams FROM big),
       |j AS (
       |  SELECT big.a, big.b, big.n_ab,
       |         CAST(floor((ln(CAST(big.n_ab AS DOUBLE) * t.n_tokens * t.n_tokens
       |           / (CAST(bt.n_bigrams AS DOUBLE) * ua.n_tok * ub.n_tok))) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS pmi
       |  FROM big JOIN uni ua ON ua.token = big.a
       |           JOIN uni ub ON ub.token = big.b, t, bt
       |  WHERE big.n_ab >= $minCount
       |)
       |SELECT a || ' ' || b AS pair, CAST(n_ab AS BIGINT) AS pair_count, pmi
       |FROM j ORDER BY pmi DESC, pair LIMIT $k""".stripMargin

  /** BPE merge application — encode every document with the top-`k`
    * merge rules ranked from the corpus pair scan ([[bpePairs]] order:
    * count desc, pair asc), applied sequentially rank 1..k.
    *
    * Token sequences travel as a delimited string `␁␁t1␁␁t2␁␁…␁␁`
    * (doubled \\u0001 between tokens, which normalized text can never
    * contain): one merge rule (a,b) is then a single literal
    * `replace(s, "␁a␁␁b␁", "␁a_b␁")`. Because the pattern consumes one
    * delimiter from each side of the doubled gap, adjacent matches don't
    * overlap — `a b a b` merges BOTH pairs, `a a a` merges only the
    * left pair — which is exactly greedy left-to-right BPE application,
    * and `replace` has identical left-to-right non-overlapping semantics
    * in Spark and DuckDB, so the oracle replays the same merges with a
    * recursive CTE and the md5 of the final string must agree byte-wise.
    *
    * The ranked merge table is vocabulary-small; it is collected to the
    * driver and folded into a codegen'd replace chain — the same way a
    * production tokenizer ships its merges file to every worker. The
    * encode pass itself is one narrow projection, no shuffle. (This
    * applies a FIXED ranking; the iterative trainer that re-counts pairs
    * after every merge is [[bpeLearnOf]], spec-proven.)
    */
  def bpeEncode(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val D = "\u0001"
    val merges = bpePairs(spark, dir, k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (pair, cnt) => (-cnt, pair) }
      .map(_._1)
    val ws = split(TextMetrics.normalized(col("text")), " ")
    val s0 = concat(lit(D + D), array_join(ws, D + D), lit(D + D))
    val sN = merges.foldLeft(s0) { (acc, pair) =>
      val Array(a, b) = pair.split(" ", 2)
      replace(acc, lit(D + a + D + D + b + D), lit(D + a + "_" + b + D))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), ws.as("ws"), sN.as("s"))
      .select(col("doc_id"),
        size(col("ws")).as("n_tokens_before"),
        (size(split(col("s"), D + D)) - 2).as("n_tokens_after"),
        md5(col("s")).as("enc_md5"))
  }

  /** The CTE body shared by [[bpeEncodeSql]] and [[fertilitySql]] —
    * emitted without the leading `WITH RECURSIVE` so callers can extend
    * the chain (the recursive `enc` CTE forces RECURSIVE onto the
    * OUTERMOST WITH of whatever query embeds this).
    */
  private def bpeEncodeCtes(k: Int): String =
    s"""w AS (
       |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
       |  FROM documents
       |), pc AS (
       |  SELECT ws[i.i] || ' ' || ws[i.i+1] AS pair, count(*) AS pair_count
       |  FROM w CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) i
       |  WHERE len(ws) >= 2
       |  GROUP BY 1 ORDER BY pair_count DESC, pair LIMIT $k
       |), m AS (
       |  SELECT row_number() OVER (ORDER BY pair_count DESC, pair) AS rk,
       |         string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
       |  FROM pc
       |), enc AS (
       |  SELECT doc_id,
       |         chr(1) || chr(1) || array_to_string(ws, chr(1) || chr(1)) || chr(1) || chr(1) AS s,
       |         0 AS step
       |  FROM w
       |  UNION ALL
       |  SELECT enc.doc_id,
       |         replace(enc.s, chr(1) || m.a || chr(1) || chr(1) || m.b || chr(1),
       |                        chr(1) || m.a || '_' || m.b || chr(1)),
       |         enc.step + 1
       |  FROM enc JOIN m ON m.rk = enc.step + 1
       |), fin AS (
       |  SELECT doc_id, s,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY step DESC) AS rn
       |  FROM enc
       |), encoded AS (
       |  SELECT w.doc_id, CAST(len(w.ws) AS INT) AS n_tokens_before,
       |         CAST(len(string_split(f.s, chr(1) || chr(1))) - 2 AS INT) AS n_tokens_after,
       |         md5(f.s) AS enc_md5
       |  FROM w JOIN fin f ON w.doc_id = f.doc_id AND f.rn = 1
       |)""".stripMargin

  def bpeEncodeSql(k: Int = 8): String =
    s"""WITH RECURSIVE ${bpeEncodeCtes(k)}
       |SELECT doc_id, n_tokens_before, n_tokens_after, enc_md5
       |FROM encoded""".stripMargin

  /** Per-language tokenizer parity report — the fairness/efficiency QA a
    * tokenizer drop ships with (fertility disparities across languages
    * are a documented failure mode of shared multilingual vocabularies):
    * per `lang`, word and post-merge token totals, the realized
    * compression (tokens per word — merges only fuse, so ≤ 1; a language
    * the merge table under-serves compresses less), and normalized chars
    * per token. Ratios land on a DECIMAL(12,6) grid; everything else is
    * exact integer sums. Cost: the [[bpeEncode]] projection (narrow, no
    * shuffle) + one lang-grain aggregate.
    */
  def fertility(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"),
      length(TextMetrics.normalized(col("text"))).cast("long").as("nc"))
    bpeEncode(spark, dir, k).join(docs, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens_before").cast("long")).as("n_words"),
        sum(col("n_tokens_after").cast("long")).as("n_tokens"),
        sum(col("nc")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_words"))
          .cast("decimal(12,6)").as("tokens_per_word"),
        (col("n_chars").cast("double") / col("n_tokens"))
          .cast("decimal(12,6)").as("chars_per_token"))
  }

  def fertilitySql(k: Int = 8): String =
    s"""WITH RECURSIVE ${bpeEncodeCtes(k)}, d AS (
       |  SELECT doc_id, lang,
       |         CAST(len(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS BIGINT) AS nc
       |  FROM documents
       |), j AS (
       |  SELECT d.lang, e.n_tokens_before, e.n_tokens_after, d.nc
       |  FROM encoded e JOIN d USING (doc_id)
       |)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_tokens_before) AS BIGINT) AS n_words,
       |       CAST(SUM(n_tokens_after) AS BIGINT) AS n_tokens,
       |       CAST(CAST(CAST(SUM(n_tokens_after) AS DOUBLE) / SUM(n_tokens_before) AS DECIMAL(12,6)) AS DOUBLE) AS tokens_per_word,
       |       CAST(CAST(CAST(SUM(nc) AS DOUBLE) / SUM(n_tokens_after) AS DECIMAL(12,6)) AS DOUBLE) AS chars_per_token
       |FROM j GROUP BY 1""".stripMargin

  /** True iterative BPE training over any documents-shaped frame: `iters`
    * rounds of (count adjacent pairs on the CURRENT sequences → merge the
    * argmax, ties broken by pair asc). Returns the learned merge rules
    * with the pair count each saw at merge time — the "merges file".
    * Each round is one distributed count + one narrow re-encode pass
    * OVER THE TRAINING SAMPLE: above `sampleCap` documents the trainer
    * deterministically keeps a ~sampleCap-doc subset via
    * [[Sampling.hashUniform]] on `doc_id` — the standard production
    * bound that turns per-merge cost from O(corpus) to O(cap); merge
    * ranks are stable under sampling because pair frequencies
    * concentrate (OpsSpec proves sampled merges == full merges on the
    * fixture). Pass `sampleCap = Long.MaxValue` to force full-corpus
    * training.
    */
  def bpeLearnOf(docs: DataFrame, iters: Int,
                 sampleCap: Long = 100000L): Seq[(String, String, Long)] = {
    val D = "\u0001"
    val n = docs.count()
    val training =
      if (n <= sampleCap) docs
      else docs.filter(
        Sampling.hashUniform(col("doc_id"), "bpe_train") <
          sampleCap.toDouble / n)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var cur = training
      .select(split(TextMetrics.normalized(col("text")), " ").as("ws"))
      .persist()
    cur.count()
    for (_ <- 1 to iters) {
      val top = cur
        .filter(size(col("ws")) >= 2)
        .select(graft.functions.WordNgramFunctions
          .wordNgrams(docs.sparkSession, col("ws"), 2).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        learned += ((a, b, top(0).getLong(1)))
        val s = concat(lit(D + D), array_join(col("ws"), D + D), lit(D + D))
        val merged = replace(s, lit(D + a + D + D + b + D), lit(D + a + "_" + b + D))
        val next = cur
          .select(slice(split(merged, D + D), lit(2),
            size(split(merged, D + D)) - 2).as("ws"))
          .persist()
        next.count()
        cur.unpersist()
        cur = next
      }
    }
    cur.unpersist()
    learned.toSeq
  }

  /** Symmetric int8 quantization per embedding: scale = max|x|/127,
    * q_i = round(x_i / scale). The storage/bandwidth primitive for
    * embedding tables — 4× smaller than float32, dequantizes to
    * scale·q_i. Scale and codes are exact decimals/ints so the oracle
    * compares bit-for-bit.
    */
  def quantize(spark: SparkSession, dir: String): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    val absMax = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), v.as("v"), absMax.as("m"))
      .select(col("vec_id"),
        // scale stays DOUBLE: a decimal cast rounds, and the two engines
        // disagree on double→decimal rounding at representation edges
        (col("m") / 127.0).as("scale"),
        posexplode(transform(col("v"), x =>
          when(col("m") === 0.0, 0)
            .otherwise(round(x * 127.0 / col("m"), 0)).cast("int"))))
      .withColumnRenamed("pos", "dim")
      .withColumnRenamed("col", "q")
  }

  val quantizeSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |), m AS (
      |  SELECT vec_id, v,
      |         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS m
      |  FROM e
      |)
      |SELECT vec_id, m / 127.0 AS scale,
      |       CAST(i.i AS INT) - 1 AS dim,
      |       CAST(CASE WHEN m = 0 THEN 0
      |                 ELSE round(v[CAST(i.i AS INT)] * 127.0 / m, 0) END AS INT) AS q
      |FROM m CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) i""".stripMargin

  /** BM25 lexical retrieval — top-k documents for a query term set, the
    * keyword-side complement of the embedding ANN path (real pipelines
    * retrieve with both). Lucene's non-negative idf variant:
    * `ln(1 + (N − df + 0.5)/(df + 0.5))`, tf saturation `k1 = 1.2`,
    * length normalization `b = 0.75`.
    *
    * Parity discipline: each (doc, term) contribution is rounded to the
    * DECIMAL(18,6) grid BEFORE the per-doc sum, so the score is an
    * order-independent exact decimal sum (a double Σ's low bits depend
    * on reduce order); ranking uses the exact decimal and the emitted
    * column is its double cast. Only the corpus-constant `avgdl` and the
    * per-pair contribution involve doubles — single expressions, no
    * accumulation, identical in both engines.
    *
    * Scale: `terms` is a literal handful — the tf side collapses to the
    * matching tokens at the scan (pushed filter), the doc-length side is
    * one count per doc; both join on doc_id after partial aggregation.
    */
  def bm25(spark: SparkSession, dir: String,
           terms: Seq[String] = Bm25Terms, k: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val toks = docs
      .select(col("doc_id"),
        explode(split(TextMetrics.normalized(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val avgdl = toks.count().toDouble / nDocs
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("doc_len"))
    val tf = toks.filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val tfD = col("tf").cast("double")
    val contrib = (idf * tfD * (lit(1.2) + 1.0) /
      (tfD + lit(1.2) * (lit(1.0) - 0.75 +
        lit(0.75) * col("doc_len").cast("double") / avgdl)))
      .cast("decimal(18,6)")
    tf.join(Bcast.ifBounded(dfreq, Bcast.Linear), "token")
      .join(lens, "doc_id")
      .select(col("doc_id"), contrib.as("c"))
      .groupBy("doc_id").agg(sum(col("c")).as("score_dec"))
      .orderBy(col("score_dec").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score_dec").cast("double").as("score"))
  }

  val Bm25Terms: Seq[String] = Seq("spark", "customer", "merge")

  def bm25Sql(terms: Seq[String] = Bm25Terms, k: Int = 20): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS token
       |  FROM documents
       |), ftoks AS (
       |  SELECT * FROM toks WHERE length(token) > 0
       |), consts AS (
       |  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM ftoks)
       |           / (SELECT COUNT(*) FROM documents) AS avgdl,
       |         (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n
       |), lens AS (
       |  SELECT doc_id, COUNT(*) AS doc_len FROM ftoks GROUP BY 1
       |), tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf FROM ftoks
       |  WHERE token IN ($inList) GROUP BY 1, 2
       |), dfreq AS (
       |  SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1
       |), contrib AS (
       |  SELECT tf.doc_id,
       |         CAST(ln(1.0 + (n - df + 0.5) / (df + 0.5))
       |              * CAST(tf AS DOUBLE) * (1.2 + 1.0)
       |              / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75
       |                   + 0.75 * CAST(doc_len AS DOUBLE) / avgdl))
       |              AS DECIMAL(18,6)) AS c
       |  FROM tf JOIN dfreq USING (token) JOIN lens USING (doc_id), consts
       |)
       |SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score
       |FROM contrib GROUP BY doc_id
       |ORDER BY SUM(c) DESC, doc_id LIMIT $k""".stripMargin
  }
}
