package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Blocked fuzzy similarity join — the entity-resolution primitive:
  * find name pairs within a small edit distance WITHOUT the all-pairs
  * comparison an unblocked fuzzy join implies.
  *
  * Matching runs on the DISTINCT-NAME dictionary, not the row stream —
  * the standard ER design: a billion-row table with a bounded name
  * vocabulary costs one distinct + vocabulary-sized matching, and each
  * emitted pair carries the record multiplicities (`n_parts_*`) that a
  * consumer joins back by name. Within the dictionary, token blocking
  * (each name enters one block per distinct token; only same-block
  * pairs are compared) turns vocab² into Σ_tok |block|², and a
  * token-frequency cap drops stop-token blocks — the knob that bounds
  * the worst block, at a documented recall cost (a pair sharing ONLY
  * capped tokens is never compared; the tradeoff every ER blocking
  * scheme makes). The final predicate is exact `levenshtein ≤ maxDist`,
  * identical unit-cost edit semantics in both engines.
  *
  * Scale shape: one map-side-combined distinct+count on the name, one
  * token explode over the dictionary, one equi-join on the token (never
  * a cartesian), `distinct` to collapse pairs blocked by several shared
  * tokens, then the edit-distance filter as a codegen'd projection over
  * candidate pairs only.
  */
object FuzzyJoin {

  /** Matched distinct-name pairs `(name_a < name_b)` with edit distance
    * and per-side record multiplicities.
    */
  def parts(spark: SparkSession, dir: String,
            maxDist: Int = 2, maxTokFreq: Long = 500): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
    val toks = names.select(col("name"), col("n_parts"),
      explode(array_distinct(split(col("name"), " "))).as("tok"))
    val keptToks = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      .filter(col("tf") <= maxTokFreq)
      .select("tok")
    val blocked = toks.join(keptToks, "tok")
    val cand = blocked.as("a")
      .join(blocked.as("b"),
        col("a.tok") === col("b.tok") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("a.n_parts").as("n_parts_a"),
        col("b.name").as("name_b"), col("b.n_parts").as("n_parts_b"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }

  def partsSql(maxDist: Int = 2, maxTokFreq: Long = 500): String =
    s"""WITH names AS (
       |  SELECT p_name AS name, COUNT(*) AS n_parts FROM part GROUP BY 1
       |), toks AS (
       |  SELECT DISTINCT name, n_parts, unnest(string_split(name, ' ')) AS tok FROM names
       |), kept AS (
       |  SELECT tok FROM toks GROUP BY tok HAVING COUNT(*) <= $maxTokFreq
       |), bl AS (
       |  SELECT t.name, t.n_parts, t.tok FROM toks t JOIN kept USING (tok)
       |), cand AS (
       |  SELECT DISTINCT a.name AS name_a, a.n_parts AS n_parts_a,
       |                  b.name AS name_b, b.n_parts AS n_parts_b
       |  FROM bl a JOIN bl b ON a.tok = b.tok AND a.name < b.name
       |)
       |SELECT name_a, n_parts_a, name_b, n_parts_b,
       |       CAST(levenshtein(name_a, name_b) AS INT) AS dist
       |FROM cand
       |WHERE levenshtein(name_a, name_b) <= $maxDist""".stripMargin
}
