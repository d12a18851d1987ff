package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization of shared intermediate datasets (silver,
  * shingle sets, LSH signatures, …) — the in-memory analog of the
  * reference's materialized layer tables. Registered queries are
  * independent entry points, but a session that runs several of them
  * (Verify, Bench, a user's notebook) should compute each shared stage
  * once: without this, `dim_customer`…`dim_status`, `fact` and
  * `dq_checks` each re-derive silver ← bronze ← the orders⋈lineitem join.
  *
  * Keyed by (session, dataset, sf-dir). Frames are snapshotted with a
  * lazy `localCheckpoint` (MEMORY_AND_DISK), which both caches the rows
  * AND cuts the logical lineage: the memo returns a `LogicalRDD`, so a
  * query composing five memoized stages plans over five leaf nodes
  * instead of the stages' combined trees. That lineage cut is
  * load-bearing for the deep retrieval stack — the composed residual
  * IVF-PQ chain re-referenced the centroid/assignment subtrees enough
  * times that per-action plan work (analysis, canonicalization for
  * cache lookup, the SQL listener's plan string) grew to minutes at
  * sf0.1 (ivfpq_topk 38 s, pq_recall 91 s measured in isolation; both
  * ≤ 8 s after the cut — the data volumes involved are only a few
  * million rows). The classic trade: a `LogicalRDD` exposes no stats
  * and no pushdown, so joins against a memo frame that must broadcast
  * carry an explicit hint via [[Bcast.ifBounded]] when the frame's row
  * bound is scale-independent (AQE's runtime sizing covers the rest —
  * it observes actual sizes, not stats), and filters that should reach
  * parquet belong INSIDE the builder, not on top of the memo.
  *
  * Cluster caveat: `localCheckpoint` blocks are NOT fault-tolerant —
  * an executor loss loses its blocks for good (lineage is cut, so no
  * recompute; Spark fails the stage). On a 1000-executor deployment the
  * memoized stages this guards are the small shared artifacts
  * (centroids, codebooks, dims — KBs to low GBs), not the 100 TB fact
  * scan, and the recovery path is coarse: a job that loses blocks fails,
  * and the caller must [[dropFamily]] (or restart the session) before
  * re-running so `apply` rebuilds from source. A deployment wanting
  * executor-loss transparency swaps `localCheckpoint` for
  * `checkpoint()` against reliable storage at the cost of a write per
  * memoized stage — same API shape, same lineage cut.
  */
object Memo {
  // Key includes the session object itself (not a hash — identityHashCode
  // can collide after GC and would hand a dead session's frame to a new
  // one). Entries for stopped sessions are dropped on the next lookup.
  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  // Which registered queries touch which memo family — recorded only
  // inside a `tracking` scope (Bench's warm-up), used by `evictAfter` to
  // unpersist a family once its alphabetically-last user has run, so a
  // 90-query bench session doesn't accumulate every family's frames
  // until the end (r6 lesson: memo/GC pressure inflated late-alphabet
  // query times ~1.3× and broke per-query attribution). The family is
  // DECLARED at each memo site (not derived from the name): per-dir knob
  // differences (e.g. nProbe varies with corpus size) change the memo
  // NAME between the warm-up SF and the bench SF, and the declared
  // family is what keeps the census valid across that rename.
  private val touchers = TrieMap.empty[String, Set[String]]
  // name → declared family, recorded at every apply (auditable census)
  private val families = TrieMap.empty[String, String]
  @volatile private var currentQuery: String = null

  /** Run `body` attributing memo touches to `query` (single-threaded
    * caller contract — Bench runs queries sequentially).
    */
  def tracking[T](query: String)(body: => T): T = {
    currentQuery = query
    try body finally currentQuery = null
  }

  /** The declared family of a memo name seen so far this session. */
  private[graft] def familyOf(name: String): Option[String] = families.get(name)

  /** Families recorded (by [[tracking]]) with ≥ 2 distinct toucher
    * queries — shared infrastructure whose build cost would otherwise be
    * billed to whichever user happens to run first (and flap with
    * eviction order; the r8 `pq_codes` 0.08↔2.26 s lesson). Value = the
    * touchers, so the caller can pick a builder.
    */
  private[graft] def sharedFamilies: Map[String, Set[String]] =
    touchers.filter(_._2.size >= 2).toMap

  /** Families recorded with exactly one toucher — per-query result
    * memos, which a pre-warm pass must re-cold so the timed run still
    * pays them.
    */
  private[graft] def singleTouchFamilies: Set[String] =
    touchers.filter(_._2.size <= 1).keys.toSet

  /** Unpersist and drop every memo entry whose family's last observed
    * toucher (alphabetically) is `query`. Safe by construction: a
    * mis-eviction degrades to recompute on the next `apply`, never to a
    * wrong result.
    */
  def evictAfter(query: String): Unit = cache.synchronized {
    val dead = touchers.collect {
      case (fam, qs) if qs.nonEmpty && qs.max == query => fam
    }.toSet
    if (dead.nonEmpty) cache.keysIterator
      .filter(k => families.get(k._2).exists(dead.contains)).toList
      .foreach(k => cache.remove(k).foreach(release))
  }

  /** Unpersist and drop every entry of `fam` regardless of tracking —
    * Bench's fresh-rerun hook for the streaming checks.
    */
  def dropFamily(fam: String): Unit = cache.synchronized {
    cache.keysIterator
      .filter(k => families.get(k._2).contains(fam)).toList
      .foreach(k => cache.remove(k).foreach(release))
  }

  /** Unpersist and drop the entries memoized under NAME `name` — the
    * query's own result memo, leaving its shared-infrastructure
    * families warm. This is Bench's re-time hook: dropping by family
    * would either no-op (a check whose family differs from its name —
    * the rerun then reads the warm memo and reports ~0 s) or evict a
    * SHARED family and bill its rebuild to one query.
    */
  def dropName(name: String): Unit = cache.synchronized {
    cache.keysIterator.filter(_._2 == name).toList
      .foreach(k => cache.remove(k).foreach(release))
  }

  /** Unpersist the RDD a localCheckpoint-ed frame caches its rows in.
    * The frame's plan is `LogicalRDD(rdd)`; `Dataset.unpersist` only
    * talks to the relation cache, so the rdd is reached reflectively
    * (`LogicalRDD` is sql-internal). Failure-safe: worst case the rows
    * stay cached until session end, the pre-eviction status quo.
    */
  private def release(df: DataFrame): Unit =
    try df.queryExecution.analyzed.collect {
      case l if l.nodeName == "LogicalRDD" =>
        l.getClass.getMethod("rdd").invoke(l) match {
          case r: org.apache.spark.rdd.RDD[_] => r.unpersist(blocking = false)
          case _ => ()
        }
    } catch { case _: Throwable => () }

  def apply(spark: SparkSession, name: String, dir: String,
            family: String)(build: => DataFrame): DataFrame =
    cache.synchronized {
      cache.keysIterator
        .filter(_._1.sparkContext.isStopped)
        .toList.foreach(cache.remove)
      families.update(name, family)
      if (currentQuery != null)
        touchers.update(family,
          touchers.getOrElse(family, Set.empty) + currentQuery)
      // synchronized: TrieMap.getOrElseUpdate may run the builder twice
      // under a race, caching an orphan frame nothing ever releases.
      // Lazy checkpoint: lineage is cut NOW (the returned plan is a
      // LogicalRDD), rows materialize on first action.
      cache.getOrElseUpdate(
        (spark, name, dir),
        build.localCheckpoint(eager = false))
    }
}
