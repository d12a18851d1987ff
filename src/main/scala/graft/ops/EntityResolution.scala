package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

/** Two-tier entity resolution (record linkage): match a dirty "CRM"
  * delivery of customer records back to the master table.
  *
  * The dirty side is derived deterministically from `customer` itself —
  * planted truth, so precision is measurable and the whole pipeline is
  * DuckDB-replayable (same pattern as the multimodal planted-truth
  * oracles): every third record gets a transposition typo in the word
  * part, every third is case-mangled, and every seventh gets a junk
  * suffix that corrupts the record's digit key.
  *
  * Tier 1 is normalize-then-block at its strongest: an exact hash join
  * on (nation, digits-only key). Tier 2 rescues the digit-corrupted
  * residuals inside (nation, 8-digit-prefix) blocks — block size is ≤ 10
  * candidates BY CONSTRUCTION (one prefix covers one decade of keys), so
  * the levenshtein scoring never sees an unbounded pair set (the same
  * "bound the block, then score exactly" discipline as [[FuzzyJoin]]).
  * Best match per record via a per-block row_number on (distance, key);
  * accepted when distance ≤ `maxDist`.
  *
  * Scale: tier 1 is one equi-join shuffle keyed on the normalized key;
  * tier 2 shuffles only the residual sliver (1/7 of records) against
  * decade-blocks; the ranking window partitions by dirty record inside
  * those bounded blocks. No cartesian stage anywhere.
  */
object EntityResolution {
  import org.apache.spark.sql.Column

  private def digitsOf(c: Column): Column =
    regexp_replace(c, "[^0-9]", "")

  /** The deterministic dirty delivery: (dirty_key, dirty name, nation). */
  private def dirty(cust: DataFrame): DataFrame =
    cust.select(
      col("c_custkey").as("dirty_key"),
      col("c_nationkey").as("d_nationkey"),
      {
        val typo = when(col("c_custkey") % 3 === 0,
          regexp_replace(col("c_name"), "Customer", "Custmoer"))
          .when(col("c_custkey") % 3 === 1, upper(col("c_name")))
          .otherwise(col("c_name"))
        when(col("c_custkey") % 7 === 0,
          concat(typo, lit("-"), (col("c_custkey") % 10).cast("string")))
          .otherwise(typo).as("dirty_name")
      })

  def customers(spark: SparkSession, dir: String, maxDist: Int = 4): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val d = dirty(cust)
      .withColumn("d_digits", digitsOf(col("dirty_name")))
      .withColumn("d_norm", lower(col("dirty_name")))
    val m = cust.select(
      col("c_custkey").as("m_key"),
      col("c_nationkey").as("m_nationkey"),
      digitsOf(col("c_name")).as("m_digits"),
      lower(col("c_name")).as("m_norm"))

    // memoized: consumed three times (own report, the residual anti-join,
    // tier 2's denominator) — one execution, not three
    val tier1 = graft.Memo(spark, "er_tier1", dir, "entity_resolution") {
      d.join(m,
        col("d_nationkey") === col("m_nationkey") &&
          col("d_digits") === col("m_digits"))
        .select(col("dirty_key"), col("m_key"),
          levenshtein(col("d_norm"), col("m_norm")).as("dist"))
    }

    val residual = d.join(tier1.select(col("dirty_key").as("mk")),
      col("dirty_key") === col("mk"), "left_anti")
    val w = Window.partitionBy("dirty_key").orderBy(col("dist"), col("m_key"))
    val tier2 = residual.join(m,
      col("d_nationkey") === col("m_nationkey") &&
        substring(col("d_digits"), 1, 8) === substring(col("m_digits"), 1, 8))
      .withColumn("dist", levenshtein(col("d_norm"), col("m_norm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("dist") <= maxDist)
      .select(col("dirty_key"), col("m_key"), col("dist"))

    // one-row report assembly — broadcast one-row frames, no driver
    // collect/count in the data path
    def aggOf(matched: DataFrame): DataFrame =
      matched.agg(
        count(lit(1)).as("n_matched"),
        count(when(col("dirty_key") === col("m_key"), 1)).as("n_correct"),
        (sum("dist").cast("double") / count(lit(1))).as("avg_dist"))
    val tot = cust.agg(count(lit(1)).as("n_total"))
    val r1 = aggOf(tier1).crossJoin(Bcast.ifBounded(tot, Bcast.OneRow))
    val out1 = r1.select(lit(1).as("tier"), col("n_total").as("n_records"),
      col("n_matched"), col("n_correct"), col("avg_dist"))
    val out2 = aggOf(tier2)
      .crossJoin(Bcast.ifBounded(
        r1.select((col("n_total") - col("n_matched")).as("n_residual")),
        Bcast.OneRow))
      .select(lit(2).as("tier"), col("n_residual").as("n_records"),
        col("n_matched"), col("n_correct"), col("avg_dist"))
    out1.unionByName(out2)
  }

  def customersSql(maxDist: Int = 4): String =
    s"""WITH dirty AS (
       |  SELECT c_custkey AS dirty_key, c_nationkey AS d_nationkey,
       |         CASE WHEN c_custkey % 7 = 0
       |              THEN t.typo || '-' || CAST(c_custkey % 10 AS VARCHAR)
       |              ELSE t.typo END AS dirty_name
       |  FROM (
       |    SELECT c_custkey, c_nationkey,
       |           CASE WHEN c_custkey % 3 = 0
       |                  THEN regexp_replace(c_name, 'Customer', 'Custmoer', 'g')
       |                WHEN c_custkey % 3 = 1 THEN upper(c_name)
       |                ELSE c_name END AS typo
       |    FROM customer
       |  ) t
       |), d AS (
       |  SELECT dirty_key, d_nationkey, dirty_name,
       |         regexp_replace(dirty_name, '[^0-9]', '', 'g') AS d_digits,
       |         lower(dirty_name) AS d_norm
       |  FROM dirty
       |), m AS (
       |  SELECT c_custkey AS m_key, c_nationkey AS m_nationkey,
       |         regexp_replace(c_name, '[^0-9]', '', 'g') AS m_digits,
       |         lower(c_name) AS m_norm
       |  FROM customer
       |), tier1 AS (
       |  SELECT dirty_key, m_key, levenshtein(d_norm, m_norm) AS dist
       |  FROM d JOIN m ON d_nationkey = m_nationkey AND d_digits = m_digits
       |), tier2 AS (
       |  SELECT dirty_key, m_key, dist FROM (
       |    SELECT d.dirty_key, m.m_key,
       |           levenshtein(d.d_norm, m.m_norm) AS dist,
       |           row_number() OVER (PARTITION BY d.dirty_key
       |                              ORDER BY levenshtein(d.d_norm, m.m_norm),
       |                                       m.m_key) AS rn
       |    FROM d JOIN m
       |      ON d.d_nationkey = m.m_nationkey
       |     AND substr(d.d_digits, 1, 8) = substr(m.m_digits, 1, 8)
       |    WHERE d.dirty_key NOT IN (SELECT dirty_key FROM tier1)
       |  ) WHERE rn = 1 AND dist <= $maxDist
       |), total AS (SELECT COUNT(*) AS n FROM customer)
       |SELECT CAST(1 AS INT) AS tier, total.n AS n_records,
       |       COUNT(*) AS n_matched,
       |       COUNT(CASE WHEN dirty_key = m_key THEN 1 END) AS n_correct,
       |       CAST(SUM(dist) AS DOUBLE) / COUNT(*) AS avg_dist
       |FROM tier1, total GROUP BY total.n
       |UNION ALL
       |SELECT CAST(2 AS INT), total.n - (SELECT COUNT(*) FROM tier1),
       |       COUNT(*),
       |       COUNT(CASE WHEN dirty_key = m_key THEN 1 END),
       |       CAST(SUM(dist) AS DOUBLE) / COUNT(*)
       |FROM tier2, total GROUP BY total.n""".stripMargin
}
