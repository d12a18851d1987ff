package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{Pipeline, Star}

/** Registry of DQ-suite + dashboard queries for the driver contract. */
object DqQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = base ++ Dashboard.queries

  private def base: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_checks" -> ((s, dir) => {
      DqSuite.run(s, Pipeline.silverCached(s, dir), Pipeline.fact(s, dir))
    }),
    // the reference function's optional date-window parameters, exercised
    "dq_checks_windowed" -> ((s, dir) => {
      DqSuite.run(s, Pipeline.silverCached(s, dir), Pipeline.fact(s, dir),
        Some(java.time.LocalDate.parse("2023-03-01")),
        Some(java.time.LocalDate.parse("2023-09-30")))
    }),
    "dq_ref_integrity" -> ((s, dir) => {
      val silver = Pipeline.silverCached(s, dir)
      val fact = Pipeline.fact(s, dir)
      DqSuite.refIntegrity(s, fact, Seq(
        ("customer", Star.dimCustomer(silver), "customer_id"),
        ("product", Star.dimProduct(silver), "product_id"),
        ("region", Star.dimRegion(silver), "region_id"),
        ("status", Star.dimStatus(silver), "status_id")))
    }),
    "quarantine_stats" -> ((s, dir) => graft.pipeline.BronzeIngest.stats(s, dir))
  )

  def oracles: Map[String, String] = Map(
    "dq_checks" -> (Pipeline.starPrefix + ", " + DqSuite.sqlCte +
      " SELECT * FROM dq_checks"),
    "dq_checks_windowed" -> (Pipeline.starPrefix + ", " + DqSuite.sqlCteWindowed(
      " AND effective_from >= DATE '2023-03-01' AND effective_to <= DATE '2023-09-30'") +
      " SELECT * FROM dq_checks"),
    "dq_ref_integrity" -> (Pipeline.starPrefix + ", " + DqSuite.refIntegritySql +
      " SELECT * FROM ref_integrity"),
    "quarantine_stats" -> ("WITH " + graft.pipeline.Bronze.sqlCte + " " +
      graft.pipeline.BronzeIngest.statsSql)
  ) ++ Dashboard.oracles
}
