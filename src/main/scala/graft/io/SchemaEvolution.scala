package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution roundtrip — the lakehouse ingestion reality that a
  * table's files were written under DIFFERENT schema versions (a column
  * added mid-history) and every read must reconcile them: day-1 files
  * carry only the original columns, day-2 files add a derived
  * `quality_tier`, and the merged read (`mergeSchema`) must surface the
  * union schema with NULL fill for the files written before the column
  * existed — never a read error, never silent column loss.
  *
  * The report is computed FROM THE MERGED READ of the reloaded files
  * (the write path is under test, per the `corpus_export` policy):
  * per day-partition row counts, NULL-fill counts for both
  * evolution-sensitive columns, and the distinct tier count. The oracle
  * replays the planting arithmetic from the source table, so a merge
  * that dropped a column, misaligned a fill, or leaked a tier into the
  * old files diverges.
  *
  * Scale: two partition writes + one partition-discovered merged scan
  * with a (day)-grain aggregate — footer-driven schema merge is
  * metadata work; the scan itself is columnar and pruned as usual.
  */
object SchemaEvolution {

  def report(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "schema_evolution", dir, "schema_evolution") {
      val docs = graft.Tables.documents(spark, dir)
      val base = java.nio.file.Files
        .createTempDirectory("graft_schema_evo").toFile
      base.deleteOnExit()
      val root = base.getAbsolutePath
      // day 1: the original schema (no n_chars, no quality_tier)
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text", "lang", "source")
        .write.mode("overwrite").parquet(s"$root/day=1")
      // day 2: schema v2 — n_chars kept, quality_tier added
      docs.filter(col("doc_id") % 2 === 1)
        .withColumn("quality_tier",
          when(col("n_chars") >= 300, "long").otherwise("short"))
        .write.mode("overwrite").parquet(s"$root/day=2")
      spark.read.option("mergeSchema", "true").parquet(root)
        .groupBy(col("day").cast("int").as("day"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("null_n_chars"),
          sum(when(col("quality_tier").isNull, 1L).otherwise(0L)).as("null_tier"),
          count_distinct(col("quality_tier")).as("n_tiers"))
    }

  /** Oracle: the evolution classes replayed from the source table. */
  val reportSql: String =
    """SELECT CAST(1 + doc_id % 2 AS INT) AS day,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS null_n_chars,
      |       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS null_tier,
      |       CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 1
      |              THEN CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END
      |            END) AS BIGINT) AS n_tiers
      |FROM documents GROUP BY 1""".stripMargin
}
