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
  * Keyed by (session, dataset, sf-dir); frames are `persist()`-ed
  * MEMORY_AND_DISK, so eviction degrades to recompute, never OOM.
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
  // query times ~1.3× and broke per-query attribution). Family key =
  // memo name with the trailing parameter suffix stripped
  // ("ivf_topk_10_50_12" → "ivf_topk"), so per-dir knob differences
  // (nProbe varies with corpus size) map to one family.
  private val touchers = TrieMap.empty[String, Set[String]]
  @volatile private var currentQuery: String = null

  private def family(name: String): String = name.replaceAll("[0-9_]+$", "")

  /** Run `body` attributing memo touches to `query` (single-threaded
    * caller contract — Bench runs queries sequentially).
    */
  def tracking[T](query: String)(body: => T): T = {
    currentQuery = query
    try body finally currentQuery = null
  }

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
      .filter(k => dead.contains(family(k._2))).toList
      .foreach(k => cache.remove(k).foreach(_.unpersist(blocking = false)))
  }

  def apply(spark: SparkSession, name: String, dir: String)(
      build: => DataFrame): DataFrame = cache.synchronized {
    cache.keysIterator
      .filter(_._1.sparkContext.isStopped)
      .toList.foreach(cache.remove)
    if (currentQuery != null) {
      val fam = family(name)
      touchers.update(fam, touchers.getOrElse(fam, Set.empty) + currentQuery)
    }
    // synchronized: TrieMap.getOrElseUpdate may run the builder twice
    // under a race, persisting an orphan frame nothing ever unpersists
    cache.getOrElseUpdate(
      (spark, name, dir),
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }
}
