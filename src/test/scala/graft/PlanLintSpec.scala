package graft

/** Registry-wide physical-plan lint: no query may plan a CartesianProduct
  * or BroadcastNestedLoopJoin unless it is on the explicit allowlist of
  * deliberate tiny-side broadcasts. Guards against a refactor silently
  * turning a keyed join into an O(n²) plan — locally invisible, fatal at
  * 100 TB.
  */
class PlanLintSpec extends SparkSpec {

  // run work inside their builders (streams / reload writes) — their plan
  // shape is covered by their own specs
  private val eager = Set("stream_hourly", "stream_dedup", "stream_sessions",
    "stream_enrich", "stream_join", "stream_upsert", "stream_hll",
    "stream_cdc", "silver_reloaded",
    "dq_reloaded", "export_reconcile", "purge_users", "io_formats",
    "compact_roundtrip")

  /** Deliberate nested-loop plans, all with a provably-small broadcast
    * side:
    *  - ann_topk: the QUERY subset (vec_id % 50) is broadcast by hint —
    *    the brute-force baseline's point;
    *  - ivf_*: the centroid table (≈ √(n/4) rows) is broadcast for the
    *    assignment / probe scoring cross joins;
    *  - dash_*: a ONE-ROW lookback threshold (scalar subquery) is
    *    broadcast against the results table — the standard scalar plan.
    */
  private val allowedNlj = Set(
    "ann_topk", "ivf_assign", "ivf_list_stats", "ivf_topk",
    "ivf_topk_filtered", // same probe stage: broadcast centroid cross join
    "ivf_append", // batch × broadcast √-law centroid table (assignment)
    "ann_recall", // composes ann_topk + ivf_topk, inherits their plans
    "emb_matryoshka", // truncated brute-force truth passes, query-side broadcast
    "pq_recall", // composes the ann_topk brute-force truth
    "ivfpq_topk", // IVF probe stage broadcasts the √-law centroid table
    "dim_customer_incremental", // upsertDim crossJoins a ONE-ROW max-id
    "events_kmv", // ONE-ROW global count × ONE-ROW merged-sketch k-th min
    "events_kmv_setops", // ONE-ROW exact counts × ONE-ROW sketch θ/k-th-min aggregates
    "events_cms", // ONE-ROW event total × the point-estimate rows
    "text_pmi", // ONE-ROW unigram/bigram totals × the frequent-pair set
    "zorder_layout", // ONE-ROW exact min/max bounds × the key stream
    "lm_score", // ONE-ROW (n_tokens, vocab) totals × the bigram stream
    "heavy_hitters", // ONE-ROW global count × the candidate exact counts
    "events_psi", // ONE-ROW time midpoint + ONE-ROW period totals
    "events_skew_report", // ONE-ROW totals × ONE-ROW top-10 aggregate
    "events_abtest", // ONE-ROW pooled z-statistic × the 2-row arm table
    "rater_agreement", // ONE-ROW kappa statistics × the 3-row rater card
    "olap_idle_customers", // ONE-ROW scalar average balance threshold
    "olap_part_value", // ONE-ROW global-total threshold (Q11 scalar subquery)
    "olap_top_supplier", // ONE-ROW scalar max revenue (Q15)
    "events_user_deciles", // ONE-ROW user-count total for NTILE arithmetic
    "orders_rfm", // same ONE-ROW totals, three quartile passes
    "sample_temperature", // ONE-ROW token/normalizer totals × source grain
    "ann_label_purity", // composes the ann_topk brute-force truth
    "entity_resolution", // ONE-ROW totals × ONE-ROW tier aggregates
    "dash_summary", "dash_by_type", "dash_trend",
    "dash_recent10", "dash_critical5")

  /** Every broadcast hint must pass through [[Bcast.ifBounded]] with a
    * declared row bound — a bare `functions.broadcast(df)` anywhere else
    * in main source is an unaudited hint that could pin a corpus-sized
    * frame into every executor at 100 TB. Source-level scan so a new
    * call site fails the build until its bound is stated.
    */
  test("broadcast hints only through Bcast.ifBounded") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val bare = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(_.getFileName.toString == "Bcast.scala")
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i)
            if line.matches(""".*(?<![.\w])broadcast\(.*""") &&
              !line.trim.startsWith("*") && !line.trim.startsWith("//") =>
            s"$p:${i + 1}"
        }
      }.toList
    assert(bare.isEmpty, s"unaudited broadcast() hints: ${bare.mkString(", ")}")
  }

  test("no unlisted query plans a cartesian or nested-loop join") {
    val offenders = SparkEntry.queries
      .filterNot(q => eager(q._1) || allowedNlj(q._1))
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        if (plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty, s"quadratic join plans in: ${offenders.mkString(", ")}")
  }
}
