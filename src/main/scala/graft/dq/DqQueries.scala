package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of DQ-suite + dashboard queries (filled by DqSuite/Dashboard). */
object DqQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
