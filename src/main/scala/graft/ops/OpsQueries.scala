package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of LLM-data-pipeline operator queries (dedup, similarity,
  * text analysis, events) — filled by the graft.ops modules.
  */
object OpsQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
