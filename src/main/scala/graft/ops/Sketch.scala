package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** KMV (k-minimum-values) distinct-count sketch — approximate
  * COUNT(DISTINCT) with a mergeable, fixed-size state, the property exact
  * distinct counts lack (they aren't additive across shards or time, which
  * is why [[EventsOps.dailyIncremental]] must keep user-grain state).
  *
  * The sketch of a set is its `k` smallest values under a uniform hash;
  * with `u = h_(k)/2^60` the normalized k-th minimum, the estimator
  * `(k−1)/u` is unbiased with relative error ≈ 1/√(k−2) (Beyer et al.,
  * SIGMOD'07, "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations" — public technique). Everything is deterministic: the
  * "randomness" is an md5 content hash, so the same rows give the same
  * sketch on any engine, partitioning, or arrival order — same policy as
  * [[Sampling.hashUniform]].
  *
  * Merge = union the sketches, keep the k smallest: the k smallest hashes
  * of a union are each among their own side's k smallest. The registered
  * query exercises exactly that shape: per-day sketches (bounded at
  * days×k rows) are merged into the whole-range estimate WITHOUT
  * rescanning events — at 100 TB the day sketches are a few KB each while
  * the exact global distinct needs a full shuffle of every distinct key.
  * (The exact counts appearing next to the estimates are the reported
  * ground truth for `rel_err`, not part of the sketch path.)
  *
  * Scale notes: the per-day ranking windows partition by day (bounded by
  * daily cardinality; a trillion-key day would take a two-level
  * bucket-then-merge refinement of the same shape). The merge ranking runs
  * on ≤ days×k rows — driver-safe by construction. The final one-row
  * global-count × one-row merged-sketch crossJoin is on the PlanLint
  * allowlist like the other provably-one-row broadcasts.
  */
object Sketch {

  /** 60-bit uniform hash of a key (first 15 hex chars of md5) — identical
    * in DuckDB via `CAST('0x' || substr(md5(...),1,15) AS BIGINT)`.
    */
  private def h60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-day + whole-range distinct-user estimates over events:
    * `(scope, n_exact, kmv_estimate, rel_err)` with scope = the date or
    * 'all'. The 'all' sketch is built by MERGING the day sketches.
    */
  def kmvDistinctUsers(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val est = when(col("n_exact") < k, col("n_exact").cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2, 60)) / col("hk").cast("double"))

    // distinct (day, user-hash) pairs: one shuffle, the shared input of
    // both the sketch path and the exact counts
    val dh = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"), h60(col("user_id")).as("h"))
      .distinct()

    val byDay = Window.partitionBy("event_date").orderBy("h")
    val dayRanked = dh.withColumn("rk", row_number().over(byDay))
    val dayRows = dayRanked
      .groupBy(col("event_date").cast("string").as("scope"))
      .agg(count(lit(1)).as("n_exact"),
        max(when(col("rk") === k, col("h"))).as("hk"))

    // merge: k smallest of the union of the day k-mins == the global
    // k smallest (each global minimum is inside its own day's k-min set)
    val mergedHk = dayRanked.filter(col("rk") <= k)
      .select("h").distinct()
      .withColumn("rk", row_number().over(Window.orderBy("h")))
      .agg(max(when(col("rk") === k, col("h"))).as("hk"))
    val globalExact = dh.select("h").distinct().agg(count(lit(1)).as("n_exact"))
    val allRow = globalExact.crossJoin(mergedHk)
      .select(lit("all").as("scope"), col("n_exact"), col("hk"))

    dayRows.unionByName(allRow)
      .select(col("scope"), col("n_exact"), est.as("kmv_estimate"),
        ((est - col("n_exact").cast("double")) / col("n_exact").cast("double"))
          .as("rel_err"))
  }

  /** Misra–Gries heavy hitters (Misra & Gries 1982; the "frequent"
    * algorithm) with an exact confirm pass — find every key whose global
    * frequency exceeds n/(k+1) WITHOUT a full-key-space shuffle.
    *
    * Stage 1 runs a k-counter Misra–Gries summary independently inside
    * each partition (`mapPartitions`, O(k) state, one pass). A key whose
    * global fraction exceeds 1/(k+1) must exceed that fraction in at
    * least one partition (averaging argument), and within a partition MG
    * provably retains any key with local count > n_p/(k+1) — so the
    * union of per-partition survivors is a SUPERSET of the true heavy
    * hitters, at most k·partitions candidates regardless of key
    * cardinality. Stage 2 semi-joins events against the broadcast
    * candidate set and counts exactly; filtering those exact counts by
    * the threshold yields precisely the true heavy-hitter set — the
    * output is deterministic even though the intermediate survivor set
    * depends on partitioning.
    *
    * At 100 TB with Zipfian keys this is the standard two-pass
    * heavy-hitter plan: the groupBy shuffles only rows whose key is in a
    * ≤ k·P candidate list instead of every distinct key. On the uniform
    * synthetic fixture the candidate pruning is weak (most keys survive
    * some partition), but the guarantee and the plan shape are the
    * point; k = 120 sits below the 150-user cardinality so the counters
    * genuinely bind and the threshold separates the top ~5 users.
    */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 120): DataFrame =
    heavyHittersOf(Tables.events(spark, dir), k)

  /** Same, over any events-shaped frame — the output is invariant to the
    * input's partitioning (see determinism note above), which the spec
    * proves by re-running on a repartitioned input.
    */
  def heavyHittersOf(events: DataFrame, k: Int): DataFrame = {
    import events.sparkSession.implicits._
    val survivors = events.select(col("user_id")).as[Long]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.LongMap.empty[Long]
        it.foreach { key =>
          if (counters.contains(key)) counters(key) += 1
          else if (counters.size < k) counters(key) = 1L
          else {
            val ks = counters.keys.toArray
            var i = 0
            while (i < ks.length) {
              val v = counters(ks(i)) - 1
              if (v == 0L) counters.remove(ks(i)) else counters(ks(i)) = v
              i += 1
            }
          }
        }
        counters.keysIterator
      }
      .distinct().toDF("user_id")

    val total = events.agg(count(lit(1)).cast("double").as("n_total"))
    events.join(broadcast(survivors), "user_id")
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") > col("n_total") / (k + 1.0))
      .select(col("user_id"), col("cnt"),
        (col("n_total") / (k + 1.0)).as("threshold"))
  }

  /** Oracle: the exact formulation the sketch+confirm provably equals. */
  def heavyHittersSql(k: Int = 120): String =
    s"""WITH t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM events)
       |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
       |       t.n_total / ${k + 1}.0 AS threshold
       |FROM events, t
       |GROUP BY user_id, t.n_total
       |HAVING COUNT(*) > t.n_total / ${k + 1}.0""".stripMargin

  /** Oracle: the global ranking formulation — result-identical because the
    * merged sketch equals the global k-min sketch (see above).
    */
  def kmvDistinctUsersSql(k: Int = 64): String =
    s"""WITH dh AS (
       |  SELECT DISTINCT CAST(ts AS DATE) AS event_date,
       |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM events
       |), tagged AS (
       |  SELECT CAST(event_date AS VARCHAR) AS scope, h FROM dh
       |  UNION ALL
       |  SELECT DISTINCT 'all' AS scope, h FROM dh
       |), ranked AS (
       |  SELECT scope, h,
       |         row_number() OVER (PARTITION BY scope ORDER BY h) AS rk
       |  FROM tagged
       |), agg AS (
       |  SELECT scope, COUNT(*) AS n_exact,
       |         MAX(CASE WHEN rk = $k THEN h END) AS hk
       |  FROM ranked GROUP BY 1
       |), est AS (
       |  SELECT scope, n_exact,
       |         CASE WHEN n_exact < $k THEN CAST(n_exact AS DOUBLE)
       |              ELSE ${(k - 1).toDouble} * 1152921504606846976.0
       |                   / CAST(hk AS DOUBLE) END AS kmv_estimate
       |  FROM agg
       |)
       |SELECT scope, n_exact, kmv_estimate,
       |       (kmv_estimate - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
       |         AS rel_err
       |FROM est""".stripMargin
}
