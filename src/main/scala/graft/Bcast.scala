package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions

/** The single gate through which every broadcast-join hint in the engine
  * passes. A hard `broadcast()` hint bypasses
  * `spark.sql.autoBroadcastJoinThreshold` entirely — the planner MUST
  * build and ship the frame to every executor, so a hint on a frame
  * whose size grows with the corpus is a latent OOM at 100 TB even when
  * it is the fastest plan at test scale. The rule enforced here (and
  * linted by PlanLintSpec's source scan — `broadcast(` may appear in no
  * other file under src/main): a call site must state the row bound it
  * can actually prove, and only scale-independent bounds keep the hint.
  * Everything else returns the frame unhinted and lets the stats-driven
  * CBO / AQE path pick the strategy from observed sizes at runtime —
  * the path proven equivalent in ScaleTechniquesSpec (AQE re-plans a
  * sort-merge join into a broadcast join whenever the built side is
  * actually small, so dropping the hint costs nothing at small SF).
  */
object Bcast {
  /** Ceiling under which a forced broadcast is safe at ANY corpus scale
    * (≲ tens of MB for typical row widths — far under executor memory).
    */
  val SafeRows: Long = 1L << 16

  /** A scalar aggregate (no grouping keys): exactly one row. */
  val OneRow: Long = 1L

  /** A frame keyed by a closed enum / domain (statuses, experiment arms,
    * raters, check types, event types, sketch registers-per-row…) —
    * bounded by the domain size, not the corpus.
    */
  val Domain: Long = 1024L

  /** TPC-H nation (25 rows) / region (5 rows): fixed by the spec. */
  val Nations: Long = 25L

  /** √-law coarse structures — the IVF centroid table (≈ √(n/4) rows,
    * sized by AnnParams). An in-memory coarse quantizer is what IVF
    * *is* (FAISS ships the same design); the √-law keeps it ≈ 40 MB
    * even at 10¹¹ vectors. The hint is kept deliberately.
    */
  val SqrtLaw: Long = SafeRows

  /** A serving/query batch — bounded by the caller's batch size in
    * production. The test fixtures derive the batch from the corpus
    * (`vec_id % m == 0`) for self-containment, but the operator
    * contract is "score a bounded batch against the corpus".
    */
  val QueryBatch: Long = SafeRows

  /** One row per shuffle partition (prefix-offset frames): bounded by
    * `spark.sql.shuffle.partitions` — configuration, not data.
    */
  val Partitions: Long = SafeRows

  /** Parameter-bounded frames — PQ codebooks (numSub × 256 codewords),
    * Misra–Gries candidate sets (k heavy hitters), probe tables
    * (k × nProbe): sized by operator parameters, not the corpus.
    */
  val Params: Long = SafeRows

  /** A corpus-proportional frame: NO hint. AQE converts the join to a
    * broadcast at runtime iff the built side is actually small.
    */
  val Linear: Long = Long.MaxValue

  /** Broadcast-hint `df` iff `provenRowBound` is scale-independent. */
  def ifBounded(df: DataFrame, provenRowBound: Long): DataFrame =
    if (provenRowBound <= SafeRows) functions.broadcast(df) else df
}
