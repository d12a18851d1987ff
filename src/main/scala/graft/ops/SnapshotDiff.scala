package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Snapshot diff — the table-version reconciliation every data platform
  * runs between two materialized loads of the same table ("what changed
  * since yesterday's snapshot?"): per-source counts of added / removed /
  * changed / unchanged rows, computed FROM THE RELOADED FILES of both
  * versions, not from in-memory frames (write-path loss or nondeterminism
  * diverges the oracle, same policy as `corpus_export`).
  *
  * v1 is the corpus as-is; v2 is the deterministic "next day": deletes
  * (doc_id % 97 == 0), in-place edits (doc_id % 89 == 0 gets a revision
  * suffix), and appends (doc_id % 83 == 0 re-keyed above the current
  * max). The diff is one full-outer join on the key over row digests —
  * md5 of the value columns — so any column change surfaces without
  * column-by-column comparison.
  *
  * Scale: the join is key-hash-partitioned (sort-merge at corpus scale),
  * digests are computed map-side inside codegen, and the output is
  * sources × 4 status rows. The single driver-side `max(doc_id)` is a
  * one-row aggregate answered by parquet footer stats. No window, no
  * collect of data rows.
  */
object SnapshotDiff {

  def report(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "snapshot_diff", dir, "snapshot_diff") {
      val docs = Tables.documents(spark, dir)
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val base = java.nio.file.Files
        .createTempDirectory("graft_snapshot_diff").toFile
      base.deleteOnExit()
      val v1 = s"${base.getAbsolutePath}/v1"
      val v2 = s"${base.getAbsolutePath}/v2"
      docs.write.mode("overwrite").parquet(v1)
      docs.filter(col("doc_id") % 97 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 89 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 83 === 0)
          .withColumn("doc_id", col("doc_id") + maxId + 1))
        .write.mode("overwrite").parquet(v2)

      def keyed(path: String, tag: String): DataFrame =
        spark.read.parquet(path).select(
          col("doc_id"),
          col("source").as(s"source_$tag"),
          md5(concat_ws("\u0001", col("text"), col("lang"), col("source"),
            col("n_chars").cast("string"))).as(s"dig_$tag"))

      keyed(v1, "a").join(keyed(v2, "b"), Seq("doc_id"), "full_outer")
        .select(
          coalesce(col("source_a"), col("source_b")).as("source"),
          when(col("dig_b").isNull, "removed")
            .when(col("dig_a").isNull, "added")
            .when(col("dig_a") === col("dig_b"), "unchanged")
            .otherwise("changed").as("status"),
          col("doc_id"))
        .groupBy("source", "status")
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_key"),
          max(col("doc_id")).as("max_key"))
    }

  /** Oracle: the change classes replayed from the planting arithmetic. */
  val reportSql: String =
    """WITH m AS (SELECT MAX(doc_id) AS mx FROM documents),
      |v AS (
      |  SELECT source,
      |         CASE WHEN doc_id % 97 = 0 THEN 'removed'
      |              WHEN doc_id % 89 = 0 THEN 'changed'
      |              ELSE 'unchanged' END AS status,
      |         doc_id
      |  FROM documents
      |  UNION ALL
      |  SELECT source, 'added' AS status, doc_id + m.mx + 1 AS doc_id
      |  FROM documents, m WHERE doc_id % 83 = 0
      |)
      |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(MIN(doc_id) AS BIGINT) AS min_key,
      |       CAST(MAX(doc_id) AS BIGINT) AS max_key
      |FROM v GROUP BY 1, 2""".stripMargin
}
