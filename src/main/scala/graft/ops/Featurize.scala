package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic hashing-trick text featurizer — the engine's OWN
  * embedding producer, closing the loop text → vector → ANN without any
  * fixture vector table (the classic feature-hashing scheme of
  * Weinberger et al., ICML'09, "Feature Hashing for Large Scale
  * Multitask Learning" — public technique, the same trick behind
  * Vowpal Wabbit and `sklearn.HashingVectorizer`).
  *
  * Pipeline, all pure column ops (no UDF, no shuffle — each document's
  * vector is computed inside one projection):
  *   1. tokens = runs of `[a-z0-9]` in `lower(text)`;
  *   2. grams  = unigrams ++ adjacent bigrams (`a_b`);
  *   3. each gram hashes to a bucket in [0, [[dim]]) via the first two
  *      hex chars of `md5(gram)` and a ±1 sign via the third hex char —
  *      the exact arithmetic [[Similarity.planeWeights]] already proved
  *      replayable in DuckDB;
  *   4. feature_b = Σ signs of grams in bucket b. Signed sums of ±1 are
  *      exact integers in doubles, so SUMMATION ORDER CANNOT MATTER —
  *      the one property that keeps the whole derived-vector chain
  *      (norms, cosines, k-means, PQ codebooks) bit-identical between
  *      Spark and the DuckDB oracle with no decimal-grid tricks.
  *
  * [[vectors]] emits the same (vec_id, v, label, norm) shape as
  * [[Similarity.normalized]], so the ENTIRE retrieval stack — IVF
  * coarse quantization, residual PQ, ADC, rerank — runs unchanged on
  * derived vectors via [[Similarity.VecCorpus]]; the SQL twin swaps the
  * `emb` CTE for [[embCteAs]] and the knob table for `documents`.
  *
  * At 100 TB: featurization is embarrassingly parallel scan work
  * (O(64·grams) flops per doc, no shuffle, whole-stage codegen); the
  * downstream index build is the IVF/PQ cost already accounted in
  * SCALE.md. Docs whose text yields no grams (norm 0) are dropped —
  * they are un-embeddable, and both engines drop them identically.
  */
object Featurize {

  /** Featurizer output dimensionality — matches [[Similarity.dim]] so
    * derived vectors are drop-in for every consumer of the embeddings
    * table.
    */
  val dim: Int = Similarity.dim

  /** Append `v` (raw hashed features) and `norm` columns derived from
    * `textCol` — the library entry point for featurizing any text frame
    * (rows whose text yields no grams get norm 0; callers decide).
    *
    * The kernel is the native codegen'd
    * [[graft.functions.FeatureHashVector]] expression — one md5 per
    * gram into a [[dim]]-slot accumulator. (Its column-op predecessor
    * re-hashed every gram once per bucket inside interpreted lambdas:
    * O(dim·grams) digests, ~194 s to featurize the sf0.1 corpus vs
    * well under a second now, bit-identical output.)
    */
  def vectorize(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("v", graft.functions.FeatureHashFunctions
        .featureHash(df.sparkSession, col(textCol), dim))
      .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))

  /** The derived vector corpus: (vec_id = doc_id, v, label = lang,
    * norm), zero-norm docs dropped. Same shape as
    * [[Similarity.normalized]].
    */
  def vectors(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "docfeat_vectors", dir, "docfeat_vectors") {
      vectorize(Tables.documents(spark, dir), "text")
        .select(col("doc_id").as("vec_id"), col("v"),
          col("lang").as("label"), col("norm"))
        .filter(col("norm") > 0)
    }

  /** The pluggable-corpus handle the IVF/PQ stack consumes. */
  lazy val corpus: Similarity.VecCorpus = Similarity.VecCorpus(
    key = "docfeat",
    countTable = "documents",
    normalizedOf = (s, d) => vectors(s, d),
    countOf = (s, d) => Tables.documents(s, d).count(),
    embCte = embCteAs("emb"))

  /** Registered `emb_featurize` output: the unit-normalized vector,
    * exploded to (doc_id, pos, feature) so every value is
    * hash-comparable (array columns render engine-dependently).
    */
  def featurized(spark: SparkSession, dir: String): DataFrame =
    vectors(spark, dir)
      .select(col("vec_id").as("doc_id"), col("norm"),
        posexplode(transform(col("v"), x => x / col("norm"))))
      .select(col("doc_id"), col("pos"), col("col").as("feature"))

  // ---------- DuckDB oracle ----------

  /** SQL twin of [[vectors]] as a CTE named `name` — a drop-in
    * replacement for [[Similarity.normCteAs]] over derived vectors.
    * `range(1, len)` / `list_transform` build the bigrams;
    * `strpos('0123456789abcdef', …)` decodes the md5 hex chars the same
    * way [[Similarity.planesCte]] does.
    */
  def embCteAs(name: String): String =
    s"""$name AS MATERIALIZED (
       |  WITH dtoks AS (
       |    SELECT doc_id, list_filter(
       |             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
       |             t -> t <> '') AS ts
       |    FROM documents
       |  ), dgrams AS (
       |    SELECT doc_id, unnest(list_concat(ts,
       |             list_transform(range(1, len(ts)),
       |               i -> ts[CAST(i AS INT)] || '_' || ts[CAST(i AS INT) + 1]))) AS g
       |    FROM dtoks
       |  ), dhash AS (
       |    SELECT doc_id,
       |           ((strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16
       |            + (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1)) % $dim AS b,
       |           CASE WHEN substr(md5(g), 3, 1) IN ('0','1','2','3','4','5','6','7')
       |                THEN 1.0 ELSE -1.0 END AS s
       |    FROM dgrams
       |  ), dagg AS (
       |    SELECT doc_id, b, SUM(s) AS f FROM dhash GROUP BY 1, 2
       |  ), dvec AS (
       |    SELECT d.doc_id, list(COALESCE(a.f, 0.0) ORDER BY i.i) AS v
       |    FROM documents d CROSS JOIN range(0, $dim) i(i)
       |    LEFT JOIN dagg a ON a.doc_id = d.doc_id AND a.b = i.i
       |    GROUP BY 1
       |  )
       |  SELECT dv.doc_id AS vec_id, dv.v, d.lang AS label,
       |         sqrt(list_dot_product(dv.v, dv.v)) AS norm
       |  FROM dvec dv JOIN documents d USING (doc_id)
       |  WHERE sqrt(list_dot_product(dv.v, dv.v)) > 0
       |)""".stripMargin

  val featurizedSql: String =
    s"""WITH ${embCteAs("femb")}
       |SELECT vec_id AS doc_id, CAST(i.i AS INT) AS pos,
       |       v[CAST(i.i AS INT) + 1] / norm AS feature
       |FROM femb CROSS JOIN range(0, $dim) i(i)""".stripMargin
}
