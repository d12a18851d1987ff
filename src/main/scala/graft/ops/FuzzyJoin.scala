package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Blocked fuzzy similarity join — the entity-resolution primitive:
  * find pairs of part names within a small edit distance WITHOUT the
  * all-pairs comparison an unblocked fuzzy join implies.
  *
  * Standard token blocking (each record enters one block per distinct
  * token; only same-block pairs are compared) turns the n² candidate
  * space into Σ_tok |block|², and a token-frequency cap drops
  * stop-token blocks — the knob that bounds the worst block at corpus
  * scale, at a documented recall cost (a pair sharing ONLY capped
  * tokens is never compared; same tradeoff every ER blocking scheme
  * makes). The final predicate is exact `levenshtein ≤ maxDist`, which
  * both engines implement with identical unit-cost edit semantics, so
  * every emitted pair is a true match within the blocked candidates.
  *
  * Scale shape: one token explode + one frequency aggregate + one
  * equi-join on the token (never a cartesian), `distinct` to collapse
  * pairs blocked by several shared tokens, then the edit-distance
  * filter as a codegen'd projection over candidate pairs only.
  */
object FuzzyJoin {

  /** Matched part-name pairs: `(part_a < part_b, names, edit distance)`. */
  def parts(spark: SparkSession, dir: String,
            maxDist: Int = 2, maxTokFreq: Long = 500): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey").as("pk"), col("p_name").as("name"))
    val toks = p.select(col("pk"), col("name"),
      explode(array_distinct(split(col("name"), " "))).as("tok"))
    val keptToks = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      .filter(col("tf") <= maxTokFreq)
      .select("tok")
    val blocked = toks.join(keptToks, "tok")
    val cand = blocked.as("a")
      .join(blocked.as("b"),
        col("a.tok") === col("b.tok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("part_a"), col("a.name").as("name_a"),
        col("b.pk").as("part_b"), col("b.name").as("name_b"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }

  def partsSql(maxDist: Int = 2, maxTokFreq: Long = 500): String =
    s"""WITH p AS (
       |  SELECT p_partkey AS pk, p_name AS name FROM part
       |), toks AS (
       |  SELECT DISTINCT pk, name, unnest(string_split(name, ' ')) AS tok FROM p
       |), kept AS (
       |  SELECT tok FROM toks GROUP BY tok HAVING COUNT(*) <= $maxTokFreq
       |), bl AS (
       |  SELECT t.pk, t.name, t.tok FROM toks t JOIN kept USING (tok)
       |), cand AS (
       |  SELECT DISTINCT a.pk AS part_a, a.name AS name_a,
       |                  b.pk AS part_b, b.name AS name_b
       |  FROM bl a JOIN bl b ON a.tok = b.tok AND a.pk < b.pk
       |)
       |SELECT part_a, name_a, part_b, name_b,
       |       CAST(levenshtein(name_a, name_b) AS INT) AS dist
       |FROM cand
       |WHERE levenshtein(name_a, name_b) <= $maxDist""".stripMargin
}
