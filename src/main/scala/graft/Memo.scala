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

  def apply(spark: SparkSession, name: String, dir: String)(
      build: => DataFrame): DataFrame = cache.synchronized {
    cache.keysIterator
      .filter(_._1.sparkContext.isStopped)
      .toList.foreach(cache.remove)
    // synchronized: TrieMap.getOrElseUpdate may run the builder twice
    // under a race, persisting an orphan frame nothing ever unpersists
    cache.getOrElseUpdate(
      (spark, name, dir),
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }
}
