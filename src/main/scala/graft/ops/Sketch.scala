package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Bcast, Tables}

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

  /** Theta-sketch set algebra over KMV sketches (Dasgupta et al., the
    * DataSketches theta framework — public technique): distinct-count
    * estimates for two user sets AND their union/intersection computed
    * from k-min-value sketches alone, never from the raw sets. This is
    * the capability that lets a pipeline answer "how many users did both
    * X and Y" from per-segment sketch state without a re-scan.
    *
    * Estimators (identical arithmetic in the oracle):
    *  - per set and union: the house KMV rule — exact when the sketch
    *    holds the whole set, else `(k−1)·2^60 / h_k`;
    *  - intersection: θ = min over inputs of (h_k or 2^60 when the set
    *    fits), candidates = retained hashes of BOTH sketches below θ,
    *    estimate = |C|·2^60/θ — which degrades gracefully to the EXACT
    *    intersection when both sets fit their sketches.
    *
    * Scale shape: one distinct per input set (map-side combined), set-
    * partitioned rank windows over user-grain rows, then everything is
    * ≤ k rows per sketch; the union merge ranks ≤ 2k hashes and the
    * intersection joins two ≤ k-row sets. Exact confirms (the `n_exact`
    * column) share the distinct frames.
    */
  def kmvSetOps(spark: SparkSession, dir: String, k: Int = 64,
                typeA: String = "purchase", typeB: String = "click"): DataFrame = {
    val two60 = math.pow(2, 60)
    val ev = Tables.events(spark, dir)
    // sets are ACTIVE USER-DAYS per activity type (the DAU-style grain):
    // every fixture user does every activity eventually, so user-grain
    // sets would coincide — user-days give the partial overlap that
    // makes the intersection estimator mean something
    def hashes(t: String) = graft.Memo(spark, s"kmv_setops_$t", dir, "events_kmv_setops") {
      ev.filter(col("event_type") === t)
        .select(h60(concat(col("user_id").cast("string"), lit(":"),
          to_date(col("ts")).cast("string"))).as("h")).distinct()
    }
    val a = hashes(typeA)
    val b = hashes(typeB)

    // k smallest hashes, globally ranked, WITHOUT a global sort: each
    // partition surrenders its local k-min (the global k smallest are a
    // subset of the union of local k-mins), then only the ≤ partitions·k
    // survivors are ranked in one place — the same two-level merge the
    // per-day KMV above uses across days.
    def kmin(df: DataFrame): DataFrame = df
      .withColumn("pid", spark_partition_id())
      .withColumn("lrk", row_number().over(Window.partitionBy("pid").orderBy("h")))
      .filter(col("lrk") <= k).select("h")
      .withColumn("rk", row_number().over(Window.orderBy("h")))
      .filter(col("rk") <= k)
    val sa = graft.Memo(spark, s"kmv_setops_sk_$typeA", dir, "events_kmv_setops")(kmin(a))
    val sb = graft.Memo(spark, s"kmv_setops_sk_$typeB", dir, "events_kmv_setops")(kmin(b))

    val estOf = when(col("n_exact") < k, col("n_exact").cast("double"))
      .otherwise(lit((k - 1).toDouble * two60) / col("hk").cast("double"))
    def row(name: String, full: DataFrame, sk: DataFrame): DataFrame =
      full.agg(count(lit(1)).as("n_exact"))
        .crossJoin(Bcast.ifBounded(
          sk.agg(max(when(col("rk") === k, col("h"))).as("hk")), Bcast.OneRow))
        .select(lit(name).as("set_op"), col("n_exact"), estOf.as("estimate"))

    // union sketch = k smallest of the two sketches' union (every global
    // minimum lives in its own set's k-min)
    val su = kmin(sa.select("h").unionByName(sb.select("h")).distinct())
    // θ = min over inputs (2^60 stands in when a set fits its sketch)
    def theta(full: DataFrame, sk: DataFrame, out: String): DataFrame =
      full.agg(count(lit(1)).as("n_exact"))
        .crossJoin(Bcast.ifBounded(
          sk.agg(max(when(col("rk") === k, col("h"))).as("hk")), Bcast.OneRow))
        .select(when(col("n_exact") < k, lit(two60))
          .otherwise(col("hk").cast("double")).as(out))
    val inter = sa.select("h").join(sb.select("h"), "h")
      .crossJoin(Bcast.ifBounded(theta(a, sa, "ta"), Bcast.OneRow))
      .crossJoin(Bcast.ifBounded(theta(b, sb, "tb"), Bcast.OneRow))
      .filter(col("h").cast("double") < least(col("ta"), col("tb")))
      .agg(count(lit(1)).as("n_cand"),
        min(least(col("ta"), col("tb"))).as("theta"))
    val interExact = a.join(b, "h").agg(count(lit(1)).as("n_exact"))
    val interRow = interExact.crossJoin(Bcast.ifBounded(inter, Bcast.OneRow))
      .select(lit("intersection").as("set_op"), col("n_exact"),
        (coalesce(col("n_cand"), lit(0L)).cast("double") * two60 /
          coalesce(col("theta"), lit(two60))).as("estimate"))

    row(typeA, a, sa).unionByName(row(typeB, b, sb))
      .unionByName(row("union", a.unionByName(b).distinct(), su))
      .unionByName(interRow)
      .select(col("set_op"), col("n_exact"),
        col("estimate").cast("decimal(18,2)").as("estimate"),
        ((col("estimate") - col("n_exact").cast("double")) /
          col("n_exact").cast("double")).cast("decimal(18,6)").as("rel_err"))
  }

  def kmvSetOpsSql(k: Int = 64, typeA: String = "purchase",
                   typeB: String = "click"): String = {
    val two60 = "1152921504606846976.0"
    s"""WITH a AS (
       |  SELECT DISTINCT CAST('0x' || substr(md5(
       |    CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)
       |  ), 1, 15) AS BIGINT) AS h
       |  FROM events WHERE event_type = '$typeA'
       |), b AS (
       |  SELECT DISTINCT CAST('0x' || substr(md5(
       |    CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)
       |  ), 1, 15) AS BIGINT) AS h
       |  FROM events WHERE event_type = '$typeB'
       |), u AS (SELECT h FROM a UNION SELECT h FROM b),
       |sa AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM a),
       |sb AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM b),
       |su AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM u),
       |sta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
       |               MAX(CASE WHEN rk = $k THEN h END) AS hk FROM sa),
       |stb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
       |               MAX(CASE WHEN rk = $k THEN h END) AS hk FROM sb),
       |stu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
       |               MAX(CASE WHEN rk = $k THEN h END) AS hk FROM su),
       |theta AS (
       |  SELECT CASE WHEN sta.n_exact < $k THEN $two60
       |              ELSE CAST(sta.hk AS DOUBLE) END AS ta,
       |         CASE WHEN stb.n_exact < $k THEN $two60
       |              ELSE CAST(stb.hk AS DOUBLE) END AS tb
       |  FROM sta, stb
       |), inter AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
       |         MIN(LEAST(theta.ta, theta.tb)) AS th
       |  FROM sa JOIN sb USING (h), theta
       |  WHERE sa.rk <= $k AND sb.rk <= $k
       |    AND CAST(h AS DOUBLE) < LEAST(theta.ta, theta.tb)
       |), inter_exact AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM a JOIN b USING (h)
       |), raw AS (
       |  SELECT '$typeA' AS set_op, n_exact,
       |         CASE WHEN n_exact < $k THEN CAST(n_exact AS DOUBLE)
       |              ELSE ${(k - 1).toDouble} * $two60 / CAST(hk AS DOUBLE) END AS estimate
       |  FROM sta
       |  UNION ALL
       |  SELECT '$typeB', n_exact,
       |         CASE WHEN n_exact < $k THEN CAST(n_exact AS DOUBLE)
       |              ELSE ${(k - 1).toDouble} * $two60 / CAST(hk AS DOUBLE) END
       |  FROM stb
       |  UNION ALL
       |  SELECT 'union', n_exact,
       |         CASE WHEN n_exact < $k THEN CAST(n_exact AS DOUBLE)
       |              ELSE ${(k - 1).toDouble} * $two60 / CAST(hk AS DOUBLE) END
       |  FROM stu
       |  UNION ALL
       |  SELECT 'intersection', inter_exact.n_exact,
       |         COALESCE(inter.n_cand, 0) * $two60 / COALESCE(inter.th, $two60)
       |  FROM inter_exact, inter
       |)
       |SELECT set_op, n_exact,
       |       CAST(CAST(estimate AS DECIMAL(18,2)) AS DOUBLE) AS estimate,
       |       CAST(CAST((estimate - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
       |         AS DECIMAL(18,6)) AS DOUBLE) AS rel_err
       |FROM raw""".stripMargin
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
    events.join(Bcast.ifBounded(survivors, Bcast.Params), "user_id")
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .crossJoin(Bcast.ifBounded(total, Bcast.OneRow))
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

  /** Mergeable quantile sketch — per-day bounded summaries merged into a
    * whole-range quantile estimate with a PROVABLE rank-error bound and
    * an exact confirm pass, the approximate companion to
    * [[EventsOps.valueQuantiles]] (which sorts; at 100 TB per-day
    * mergeable state is what survives, same argument as the KMV sketch
    * above).
    *
    * Summary of a (type, day) group of n rows: the order statistics at
    * ranks {step, 2·step, …} ∪ {n} with step = ⌈n/k⌉, each carrying the
    * weight of the raw rows it closes — ≤ k+1 rows per group, the
    * equi-spaced special case of the GK/q-digest summary family
    * (Greenwald & Khanna, SIGMOD'01 — public technique). Merging is a
    * weighted union: sort all anchors by value, accumulate weights, and
    * answer quantile q with the first anchor whose cumulative weight
    * reaches target = ⌈q·N⌉. Each day's contribution to any cumulative
    * weight differs from its true ≤-count by < step_d, so the merged
    * estimate's rank error is bounded by Σ_d step_d — the `err_bound`
    * column; `rank_err` is the measured distance from the target to the
    * estimate's TRUE rank interval [lo+1, hi] (the exact confirm pass:
    * one counting scan, no sort). Everything is integer or
    * order-of-doubles deterministic, so the DuckDB oracle replays the
    * sketch path bit-for-bit AND re-derives the confirm counts.
    *
    * Scale: the per-day window sorts within (type, day) partitions
    * (bounded, parallel); state is days×k rows per type (KBs); the
    * merge ranks ≤ days×k rows; the confirm is one scan with a
    * broadcast of 3 estimates per type. The full-range sort never
    * happens.
    */
  def quantileSketch(spark: SparkSession, dir: String,
                     k: Int = 16): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("event_date"),
        col("value"), col("event_id"))
    quantMergeConfirm(
      quantAnchors(ev, k, Seq("event_type", "event_date")),
      ev, Seq("event_type", "event_date"))
  }

  /** The mergeable summary of `ev` at the `grp` grain (first col must be
    * `event_type`): ≤ k+1 weighted order-statistic anchors per group,
    * `(grp…, value, r, w)`. The group's n and step are recoverable from
    * its anchors alone (n = Σw; step = max w — every anchor weighs step
    * except a lighter last remainder), so the anchor rows ARE the whole
    * state a fold needs to persist.
    */
  private[graft] def quantAnchors(ev: DataFrame, k: Int,
                                  grp: Seq[String]): DataFrame = {
    val byG = Window.partitionBy(grp.map(col): _*)
      .orderBy(col("value"), col("event_id"))
    val counts = ev.groupBy(grp.map(col): _*)
      .agg(count(lit(1)).as("n_d"))
      .withColumn("step", expr(s"(n_d + ${k - 1}) DIV $k"))
    val ranked = ev.withColumn("r", row_number().over(byG))
      .join(counts, grp)
    ranked
      .filter(col("r") % col("step") === 0 || col("r") === col("n_d"))
      .withColumn("w", when(col("r") % col("step") === 0, col("step"))
        .otherwise(col("n_d") % col("step")))
      .select(grp.map(col) ++ Seq(col("value"), col("r"), col("w")): _*)
  }

  /** Weighted-union merge of anchor summaries per type + exact one-scan
    * confirm against `ev`. `grp` is the summary grain the anchors carry;
    * the merge ordering ties on `(value, grp.tail…, r)` — total by
    * construction, so both engines rank identically.
    */
  private[graft] def quantMergeConfirm(anchors: DataFrame, ev: DataFrame,
                                       grp: Seq[String],
                                       pcts: Seq[Int] = Seq(50, 95, 99)): DataFrame = {
    // merge: weighted cumulative rank over the anchor union per type
    val mergeW = Window.partitionBy("event_type")
      .orderBy(col("value") +: (grp.tail.map(col) :+ col("r")): _*)
    val cum = anchors.withColumn("cumw", sum("w").over(mergeW))
    val totals = anchors.groupBy(grp.map(col): _*)
      .agg(sum("w").as("n_d"), max("w").as("step"))
      .groupBy("event_type")
      .agg(sum("n_d").as("n"), sum("step").as("err_bound"))
    val targets = totals.select(col("event_type"), col("n"), col("err_bound"),
      explode(array(pcts.map(lit): _*)).as("pct"))
      .withColumn("target_rank", expr("(n * pct + 99) DIV 100"))

    val est = cum.join(Bcast.ifBounded(targets, Bcast.Domain), Seq("event_type"))
      .filter(col("cumw") >= col("target_rank"))
      .groupBy("event_type", "pct", "n", "err_bound", "target_rank")
      .agg(min("value").as("sketch_value"))

    // exact confirm: one counting pass, no sort
    val confirm = ev.join(Bcast.ifBounded(est, Bcast.Domain), Seq("event_type"))
      .groupBy("event_type", "pct", "n", "err_bound", "target_rank",
        "sketch_value")
      .agg(sum(when(col("value") < col("sketch_value"), 1L).otherwise(0L))
          .as("rank_lo"),
        sum(when(col("value") <= col("sketch_value"), 1L).otherwise(0L))
          .as("rank_hi"))
    confirm.select(col("event_type"), col("pct"), col("n"),
      col("target_rank"), col("sketch_value"), col("rank_lo"), col("rank_hi"),
      greatest(lit(0L), col("rank_lo") + 1 - col("target_rank"),
        col("target_rank") - col("rank_hi")).as("rank_err"),
      col("err_bound"))
  }

  /** Oracle: the identical sketch replayed in SQL (same day summaries,
    * same weighted merge, same confirm counts).
    */
  def quantileSketchSql(k: Int = 16): String = quantSketchSqlOf(k, grain = "")

  /** The same replay at the `(event_type, event_date [, delivery])`
    * summary grain: `grain` is an extra comma-led key expression list
    * (e.g. ", delivery") whose columns the `delivered` relation must
    * provide; empty for the plain per-day sketch. Shared by the batch
    * oracle and the streaming fold's oracle — the streaming variant's
    * only semantic difference IS the finer summary grain, so the two
    * oracles must stay textually one.
    */
  private[graft] def quantSketchSqlOf(k: Int, grain: String,
                                      source: String = "events",
                                      prelude: String = ""): String =
    s"""WITH $prelude ranked AS (
       |  SELECT event_type, CAST(ts AS DATE) AS event_date, value, event_id$grain,
       |         row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)$grain
       |                            ORDER BY value, event_id) AS r,
       |         COUNT(*) OVER (PARTITION BY event_type, CAST(ts AS DATE)$grain) AS n_d
       |  FROM $source
       |), anchors AS (
       |  SELECT event_type, event_date, value, r$grain,
       |         CASE WHEN r % ((n_d + ${k - 1}) // $k) = 0
       |              THEN (n_d + ${k - 1}) // $k
       |              ELSE n_d % ((n_d + ${k - 1}) // $k) END AS w
       |  FROM ranked
       |  WHERE r % ((n_d + ${k - 1}) // $k) = 0 OR r = n_d
       |), cum AS (
       |  SELECT event_type, value, event_date, r, w,
       |         SUM(w) OVER (PARTITION BY event_type
       |                      ORDER BY value, event_date$grain, r) AS cumw
       |  FROM anchors
       |), totals AS (
       |  SELECT event_type, CAST(SUM(n_d) AS BIGINT) AS n,
       |         CAST(SUM(step) AS BIGINT) AS err_bound
       |  FROM (SELECT DISTINCT event_type, event_date$grain, n_d,
       |               (n_d + ${k - 1}) // $k AS step
       |        FROM ranked)
       |  GROUP BY 1
       |), targets AS (
       |  SELECT event_type, n, err_bound, CAST(p.pct AS INT) AS pct,
       |         (n * p.pct + 99) // 100 AS target_rank
       |  FROM totals, (VALUES (50), (95), (99)) p(pct)
       |), est AS (
       |  SELECT t.event_type, t.pct, t.n, t.err_bound, t.target_rank,
       |         MIN(c.value) AS sketch_value
       |  FROM targets t JOIN cum c
       |    ON c.event_type = t.event_type AND c.cumw >= t.target_rank
       |  GROUP BY 1, 2, 3, 4, 5
       |), confirm AS (
       |  SELECT e.event_type, s.pct, s.n, s.err_bound, s.target_rank,
       |         s.sketch_value,
       |         CAST(SUM(CASE WHEN e.value < s.sketch_value THEN 1 ELSE 0 END) AS BIGINT) AS rank_lo,
       |         CAST(SUM(CASE WHEN e.value <= s.sketch_value THEN 1 ELSE 0 END) AS BIGINT) AS rank_hi
       |  FROM events e JOIN est s ON s.event_type = e.event_type
       |  GROUP BY 1, 2, 3, 4, 5, 6
       |)
       |SELECT event_type, pct, n, target_rank, sketch_value, rank_lo, rank_hi,
       |       GREATEST(0, rank_lo + 1 - target_rank, target_rank - rank_hi) AS rank_err,
       |       err_bound
       |FROM confirm""".stripMargin

  /** HyperLogLog distinct-count sketch (Flajolet et al., AofA'07 —
    * public technique; the de-facto standard for distinct counting at
    * scale) — the CONSTANT-size companion to the KMV sketch above: where
    * KMV keeps k hash values, HLL keeps m = 2^b one-byte registers
    * (register j = max ρ of the keys landing in j, ρ = leading-zero rank
    * of the remaining hash bits). Registers merge by element-wise MAX —
    * an algebraic aggregate, so Spark computes the whole sketch with
    * map-side partial aggregation: at 100 TB each task reduces its split
    * to m bytes before anything shuffles, and the per-day states the
    * query materializes union into the whole-range estimate without
    * rescanning (the 'all' row below is built by MERGING the day
    * registers, exactly the cross-shard/cross-day reuse a production
    * rollup needs).
    *
    * Everything is deterministic and engine-replayable:
    *  - the "randomness" is the same md5 content hash as [[h60]]
    *    (register = low b bits, ρ from the remaining 52 via the length
    *    of the binary string — `bin()` exists in both engines);
    *  - Σ 2^−M_j is summed as the EXACT integer Σ 2^(53−M_j) (≤ m·2^53
    *    fits a long), so the harmonic mean is order-independent;
    *  - the standard small-range correction (linear counting on the V
    *    empty registers when E_raw ≤ 2.5m) branches on exact integers,
    *    so both engines take the same branch; the one `ln` matches the
    *    precedent [[graft.ops.TextPrep.bm25]] set, and the estimate is
    *    rounded to a DECIMAL(14,4) grid before comparison.
    *
    * `within_bound` asserts |rel_err| ≤ 3·1.04/√m — the 3σ band of the
    * raw estimator, conservative for the linear-counting regime.
    */
  def hllDistinctUsers(spark: SparkSession, dir: String, b: Int = 8): DataFrame =
    hllOf(Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"), col("user_id")), b)

  /** Same, over any (event_date, user_id) frame — partitioning-invariant
    * (hash content, algebraic max), which the spec proves by re-running
    * on a repartitioned input; the raw-regime branch is proven on a
    * synthetic high-cardinality frame.
    */
  def hllOf(dayKeys: DataFrame, b: Int = 8): DataFrame = {
    val dh = dayHashes(dayKeys)
    hllEstimates(dayRegisters(dh, b), dh, b)
  }

  /** Distinct (event_date, user-hash) pairs — the shared input of the
    * register build and the exact ground truth.
    */
  private[graft] def dayHashes(dayKeys: DataFrame): DataFrame =
    dayKeys.select(col("event_date"), h60(col("user_id")).as("h")).distinct()

  /** Per-(day, register) max-ρ — the CONSTANT-SIZE mergeable HLL state.
    * Exposed separately so the streaming fold
    * ([[graft.streaming.EventStream.hllStreamCheck]]) can max-merge
    * per-batch register deltas into versioned state; re-hashed
    * duplicates across batches are absorbed by the max, so the fold is
    * idempotent per key by construction.
    */
  private[graft] def dayRegisters(dh: DataFrame, b: Int = 8): DataFrame = {
    val m = 1 << b
    val w = expr(s"h DIV $m")
    dh.select(col("event_date"), pmod(col("h"), lit(m.toLong)).as("reg"),
      when(w > 0, lit(53) - length(bin(w))).otherwise(lit(53)).as("rho"))
      .groupBy("event_date", "reg").agg(max("rho").as("mj"))
  }

  /** Estimates from a register state; `dh` supplies the exact ground
    * truth the report carries beside the sketch (not part of the sketch
    * path).
    */
  private[graft] def hllEstimates(dayReg: DataFrame, dh: DataFrame,
                                  b: Int = 8): DataFrame = {
    val m = 1 << b
    // merge = element-wise max of the day registers (never rescans dh)
    val scopeReg = dayReg
      .select(col("event_date").cast("string").as("scope"), col("reg"), col("mj"))
      .unionByName(dayReg.groupBy("reg").agg(max("mj").as("mj"))
        .select(lit("all").as("scope"), col("reg"), col("mj")))
    // registers no key ever touched hold ρ = 0: join against the spine
    val spine = scopeReg.select("scope").distinct()
      .select(col("scope"), explode(sequence(lit(0), lit(m - 1))).as("reg"))
    val filled = spine.join(scopeReg, Seq("scope", "reg"), "left")
      .select(col("scope"), coalesce(col("mj"), lit(0)).as("mj"))
    val st = filled.groupBy("scope").agg(
      // 2^(53−mj) is exact in a double for mj ∈ [0,53]; the long sum is
      // exact and order-free (≤ m·2^53 = 2^61 < 2^63)
      sum(pow(lit(2.0), lit(53) - col("mj")).cast("long")).as("s"),
      sum(when(col("mj") === 0, 1L).otherwise(0L)).as("v"))
    hllFromState(st, hllExactByScope(dh), b)
  }

  /** Exact per-day + whole-range distinct counts keyed by scope — the
    * ground-truth side every HLL report joins.
    */
  private[graft] def hllExactByScope(dh: DataFrame): DataFrame =
    dh.groupBy(col("event_date").cast("string").as("scope"))
      .agg(count(lit(1)).as("n_exact"))
      .unionByName(dh.select("h").distinct().agg(count(lit(1)).as("n_exact"))
        .select(lit("all").as("scope"), col("n_exact")))

  /** The dual-regime estimator over `(scope, s, v)` state joined to the
    * exact counts — shared by the SQL-composed and UDAF register builds.
    */
  private[graft] def hllFromState(st: DataFrame, ex: DataFrame, b: Int): DataFrame = {
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = lit(alpha) * m * m * lit(9007199254740992.0) / col("s").cast("double")
    val isLinear = raw <= lit(2.5 * m) && col("v") > 0
    val estD = when(isLinear,
      lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
      .otherwise(raw).cast("decimal(14,4)").cast("double")
    st.join(ex, "scope")
      .select(col("scope"), col("n_exact"),
        when(isLinear, lit("linear")).otherwise(lit("raw")).as("mode"),
        estD.as("hll_estimate"),
        ((estD - col("n_exact")) / col("n_exact")).as("rel_err"),
        (abs((estD - col("n_exact")) / col("n_exact")) <=
          lit(3.0 * 1.04 / math.sqrt(m))).as("within_bound"))
  }

  /** [[hllDistinctUsers]] through the native aggregate path: one
    * `hll_sketch` pass builds each day's registers WITHOUT the distinct
    * pre-pass (the register max absorbs duplicates), and the 'all' row
    * is `hll_merge` over the day states — the whole register build is a
    * single-buffer `TypedImperativeAggregate` with map-side partial
    * merge, so at 100 TB each task ships 2^b bytes per day instead of
    * its distinct keys. Result is bit-identical to the SQL-composed
    * build (same h60 hash, same ρ, same estimator), so the oracle is
    * [[hllDistinctUsersSql]] verbatim; the exact `n_exact` ground truth
    * beside the estimates still needs its own distinct pass (it is
    * reported truth, not sketch state).
    */
  def hllDistinctUsersUdaf(spark: SparkSession, dir: String, b: Int = 8): DataFrame = {
    graft.functions.SketchAggFunctions.register(spark)
    val m = 1 << b
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"), col("user_id"))
    val day = ev.groupBy("event_date")
      .agg(call_function("hll_sketch", col("user_id").cast("string"), lit(b))
        .as("regs"))
    val scoped = day
      .select(col("event_date").cast("string").as("scope"), col("regs"))
      .unionByName(day
        .agg(call_function("hll_merge", col("regs"), lit(b)).as("regs"))
        .select(lit("all").as("scope"), col("regs")))
    // (s, v) from the complete register array — exact long arithmetic
    val st = scoped.select(col("scope"),
      expr("aggregate(regs, 0L, (acc, mj) -> acc + shiftleft(1L, 53 - mj))")
        .as("s"),
      size(filter(col("regs"), mj => mj === 0)).cast("long").as("v"))
    hllFromState(st, hllExactByScope(dayHashes(ev)), b)
  }

  /** [[kmvDistinctUsers]] through the native aggregate path: per-day
    * k-min states from one `kmv_sketch` pass (bounded distinct-min
    * buffer — no distinct pre-pass, no rank window), merged into the
    * whole-range sketch by `kmv_union` over the day arrays. Estimator
    * arithmetic identical to the SQL-composed build, so the oracle is
    * [[kmvDistinctUsersSql]] verbatim.
    */
  def kmvDistinctUsersUdaf(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    graft.functions.SketchAggFunctions.register(spark)
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"), col("user_id"))
    val day = ev.groupBy("event_date")
      .agg(call_function("kmv_sketch", col("user_id").cast("string"), lit(k))
        .as("mins"))
    val scoped = day
      .select(col("event_date").cast("string").as("scope"), col("mins"))
      .unionByName(day
        .agg(call_function("kmv_union", col("mins"), lit(k)).as("mins"))
        .select(lit("all").as("scope"), col("mins")))
    val est = when(col("n_exact") < k, col("n_exact").cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2, 60)) /
        element_at(col("mins"), k).cast("double"))
    scoped.join(hllExactByScope(dayHashes(ev)), "scope")
      .select(col("scope"), col("n_exact"), est.as("kmv_estimate"),
        ((est - col("n_exact").cast("double")) / col("n_exact").cast("double"))
          .as("rel_err"))
  }

  /** Oracle: the identical register arithmetic replayed in SQL. */
  def hllDistinctUsersSql(b: Int = 8): String = {
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val bound = 3.0 * 1.04 / math.sqrt(m)
    s"""WITH dh AS (
       |  SELECT DISTINCT CAST(ts AS DATE) AS event_date,
       |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM events
       |), rho AS (
       |  SELECT event_date, h % $m AS reg,
       |         CASE WHEN h // $m > 0 THEN 53 - length(bin(h // $m)) ELSE 53 END AS rho
       |  FROM dh
       |), dayreg AS (
       |  SELECT event_date, reg, MAX(rho) AS mj FROM rho GROUP BY 1, 2
       |), scopereg AS (
       |  SELECT CAST(event_date AS VARCHAR) AS scope, reg, mj FROM dayreg
       |  UNION ALL
       |  SELECT 'all' AS scope, reg, MAX(mj) AS mj FROM dayreg GROUP BY 2
       |), spine AS (
       |  SELECT scope, i.range AS reg
       |  FROM (SELECT DISTINCT scope FROM scopereg) sc CROSS JOIN range(0, $m) i
       |), filled AS (
       |  SELECT sp.scope, sp.reg, COALESCE(r.mj, 0) AS mj
       |  FROM spine sp LEFT JOIN scopereg r ON r.scope = sp.scope AND r.reg = sp.reg
       |), st AS (
       |  SELECT scope,
       |         CAST(SUM(CAST(power(2.0, 53 - mj) AS BIGINT)) AS BIGINT) AS s,
       |         SUM(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS v
       |  FROM filled GROUP BY 1
       |), ex AS (
       |  SELECT CAST(event_date AS VARCHAR) AS scope, COUNT(*) AS n_exact
       |  FROM dh GROUP BY 1
       |  UNION ALL
       |  SELECT 'all', COUNT(DISTINCT h) FROM dh
       |), est AS (
       |  SELECT scope, n_exact,
       |    CASE WHEN raw <= ${2.5 * m} AND v > 0 THEN 'linear' ELSE 'raw' END AS mode,
       |    CAST(CAST(CASE WHEN raw <= ${2.5 * m} AND v > 0
       |         THEN $m * ln($m / CAST(v AS DOUBLE))
       |         ELSE raw END AS DECIMAL(14,4)) AS DOUBLE) AS hll_estimate
       |  FROM (SELECT st.scope, n_exact, v,
       |               CAST($alpha AS DOUBLE) * $m * $m * 9007199254740992E0
       |                 / CAST(s AS DOUBLE) AS raw
       |        FROM st JOIN ex ON st.scope = ex.scope)
       |)
       |SELECT scope, CAST(n_exact AS BIGINT) AS n_exact, mode, hll_estimate,
       |       (hll_estimate - n_exact) / n_exact AS rel_err,
       |       abs((hll_estimate - n_exact) / n_exact) <= $bound AS within_bound
       |FROM est""".stripMargin
  }

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

  /** Count-Min frequency sketch (Cormode & Muthukrishnan, J. Algorithms
    * 2005 — public technique) — the POINT-FREQUENCY companion to the
    * distinct (KMV/HLL) and rank (quantile) sketches above: a d×w counter
    * matrix where row i increments counter h_i(key) mod w; the estimate
    * for a key is the MIN over its d counters. Counters merge by
    * element-wise ADDITION — algebraic, so per-day states union into the
    * whole-range sketch without rescanning events (the same cross-day
    * reuse the HLL query proves for distinct counts), and at 100 TB each
    * task's map-side partial reduces its split to ≤ d·w longs before
    * anything shuffles.
    *
    * Two provable properties, both emitted as columns:
    *  - `never_under`: CMS never under-counts (every counter a key hashes
    *    into contains at least that key's full count) — holds
    *    unconditionally, an invariant of the structure;
    *  - `within_bound`: overcount ≤ (e/w)·N, the paper's ε·N bound at
    *    δ = e^−d. It is probabilistic per key, but DETERMINISTIC given
    *    the md5 row-salted hash, so both engines compute the identical
    *    boolean and the oracle hash-matches even if some key exceeded it.
    *
    * The point-query sample is id-deterministic (`user_id % queryMod`),
    * like every other measurement sample in this library; the exact
    * counts beside the estimates are reported ground truth, not part of
    * the sketch path.
    */
  def cmsUserCounts(spark: SparkSession, dir: String, d: Int = 4,
                    w: Int = 256, queryMod: Int = 7): DataFrame =
    cmsOf(Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"), col("user_id")),
      d, w, queryMod)

  /** Same, over any (event_date, user_id) frame — partitioning-invariant
    * (content hash + algebraic sums), which the spec proves by re-running
    * repartitioned, and merge-correct (day sketches summed == the sketch
    * of the whole range), which the spec proves against a direct global
    * build.
    */
  def cmsOf(dayKeys: DataFrame, d: Int = 4, w: Int = 256,
            queryMod: Int = 7): DataFrame = {
    // row-salted 60-bit hash → counter column: h_i(key) = md5(i‖'_'‖key)
    def bucket(r: org.apache.spark.sql.Column,
               key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      pmod(conv(substring(md5(concat_ws("_", r.cast("string"),
        key.cast("string"))), 1, 15), 16, 10).cast("long"), lit(w.toLong))

    // per-(day,user) exact counts: one map-side-combined aggregate, the
    // shared input of the sketch path and the ground truth
    val dayUser = dayKeys.groupBy("event_date", "user_id")
      .agg(count(lit(1)).as("cnt"))
    // d counter updates per key; day sketch = (day, row, col) sums,
    // bounded at days × d × w rows no matter the key cardinality
    val dayCms = dayUser
      .select(col("event_date"), col("user_id"), col("cnt"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("c", bucket(col("r"), col("user_id")))
      .groupBy("event_date", "r", "c").agg(sum("cnt").as("counter"))
    // merge = counter addition across the day states (never rescans)
    val merged = dayCms.groupBy("r", "c").agg(sum("counter").as("counter"))

    val total = dayUser.agg(sum("cnt").as("n_total"))
    val exact = dayUser.groupBy("user_id").agg(sum("cnt").as("n_exact"))
      .filter(col("user_id") % queryMod === 0)
    val estimates = exact
      .select(col("user_id"), col("n_exact"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("c", bucket(col("r"), col("user_id")))
      .join(merged, Seq("r", "c"))
      .groupBy("user_id", "n_exact").agg(min("counter").as("cms_estimate"))
    // one-row totals broadcast (PlanLint-allowlisted shape)
    estimates.crossJoin(Bcast.ifBounded(total, Bcast.OneRow))
      .select(col("user_id"), col("n_exact"), col("cms_estimate"),
        (col("cms_estimate") - col("n_exact")).as("overcount"),
        (col("cms_estimate") >= col("n_exact")).as("never_under"),
        ((col("cms_estimate") - col("n_exact")).cast("double") <=
          lit(math.E / w) * col("n_total").cast("double")).as("within_bound"))
  }

  /** Oracle: the identical counter arithmetic replayed in SQL. */
  def cmsUserCountsSql(d: Int = 4, w: Int = 256, queryMod: Int = 7): String =
    s"""WITH du AS (
       |  SELECT CAST(ts AS DATE) AS event_date, user_id, COUNT(*) AS cnt
       |  FROM events GROUP BY 1, 2
       |), daycms AS (
       |  SELECT event_date, r, c, SUM(cnt) AS counter FROM (
       |    SELECT event_date, cnt, i.range AS r,
       |           CAST('0x' || substr(md5(i.range || '_' || user_id), 1, 15) AS BIGINT) % $w AS c
       |    FROM du CROSS JOIN range(0, $d) i
       |  ) GROUP BY 1, 2, 3
       |), merged AS (
       |  SELECT r, c, SUM(counter) AS counter FROM daycms GROUP BY 1, 2
       |), t AS (SELECT SUM(cnt) AS n_total FROM du),
       |exact AS (
       |  SELECT user_id, SUM(cnt) AS n_exact FROM du
       |  WHERE user_id % $queryMod = 0 GROUP BY 1
       |), est AS (
       |  SELECT user_id, n_exact, MIN(counter) AS cms_estimate FROM (
       |    SELECT e.user_id, e.n_exact, i.range AS r,
       |           CAST('0x' || substr(md5(i.range || '_' || e.user_id), 1, 15) AS BIGINT) % $w AS c
       |    FROM exact e CROSS JOIN range(0, $d) i
       |  ) p JOIN merged m ON m.r = p.r AND m.c = p.c
       |  GROUP BY 1, 2
       |)
       |SELECT user_id, CAST(n_exact AS BIGINT) AS n_exact,
       |       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       |       CAST(cms_estimate - n_exact AS BIGINT) AS overcount,
       |       cms_estimate >= n_exact AS never_under,
       |       CAST(cms_estimate - n_exact AS DOUBLE) <=
       |         ${math.E / w} * CAST(t.n_total AS DOUBLE) AS within_bound
       |FROM est, t""".stripMargin
}
