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
      .foreach(k => cache.remove(k).foreach(_.unpersist(blocking = false)))
  }

  /** Unpersist and drop every entry of `fam` regardless of tracking —
    * Bench's fresh-rerun hook for the streaming checks.
    */
  def dropFamily(fam: String): Unit = cache.synchronized {
    cache.keysIterator
      .filter(k => families.get(k._2).contains(fam)).toList
      .foreach(k => cache.remove(k).foreach(_.unpersist(blocking = false)))
  }

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
      // under a race, persisting an orphan frame nothing ever unpersists
      cache.getOrElseUpdate(
        (spark, name, dir),
        build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
}
