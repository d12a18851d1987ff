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
  private val cache = TrieMap.empty[(Int, String, String), DataFrame]

  def apply(spark: SparkSession, name: String, dir: String)(
      build: => DataFrame): DataFrame =
    cache.getOrElseUpdate(
      (System.identityHashCode(spark), name, dir),
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
}
