package graft.dq

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's data-quality check framework
  * (`/root/reference/sql/dds/s_sql_dds/function/fn_dq_checks_load.sql:13-196`),
  * re-expressed Spark-first: five checks + a summary row, each check an
  * independent aggregation isolated in `Try` (the PL/pgSQL
  * `BEGIN...EXCEPTION WHEN OTHERS` per-check blocks, M4) so one failure
  * yields an 'error' row instead of killing the run.
  *
  * Result row schema mirrors `t_dq_check_results.sql:4-16` minus the
  * runtime columns (`execution_date` timestamp; SERIAL check_id becomes the
  * deterministic per-run ordinal 1..6) so the result is oracle-comparable.
  *
  * Scale shape (100 TB): the five checks collapse into THREE distributed
  * jobs — one aggregate over silver (sum), one single-pass multi-aggregate
  * over the fact (sum + null count + bad-date count + bad-salary count +
  * total), and one groupBy for uniqueness — instead of five separate fact
  * scans as in the reference. Each reduces to a scalar on the driver; no
  * row data is collected.
  */
object DqSuite {

  val schema: StructType = StructType(Seq(
    StructField("check_id", IntegerType, nullable = false),
    StructField("check_type", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = true),
    StructField("check_name", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("expected_value", DoubleType, nullable = true),
    StructField("actual_value", DoubleType, nullable = true),
    StructField("error_threshold", DoubleType, nullable = true),
    StructField("error_message", StringType, nullable = true)
  ))

  private case class FactStats(sum: Double, nullPct: Option[Double],
                               badDates: Long, badSalary: Long)

  /** Run the five checks + summary over silver ("source") and fact
    * ("mart"). The optional date window mirrors the reference's NULL-able
    * `start_dt`/`end_dt` parameters (P3): each bound is applied only when
    * set, as a plain range predicate on both frames — built conditionally
    * in Scala so a set bound prunes, never a literal `IS NULL OR`.
    */
  def run(spark: SparkSession, silver: DataFrame, fact: DataFrame,
          start: Option[java.time.LocalDate] = None,
          end: Option[java.time.LocalDate] = None): DataFrame = {
    def windowed(df: DataFrame): DataFrame = Seq(
      start.map(d => col("effective_from") >= lit(java.sql.Date.valueOf(d))),
      end.map(d => col("effective_to") <= lit(java.sql.Date.valueOf(d)))
    ).flatten.foldLeft(df)(_ filter _)
    runOn(spark, windowed(silver), windowed(fact))
  }

  private def runOn(spark: SparkSession, silver: DataFrame, fact: DataFrame): DataFrame = {
    // Shared aggregates, each its own Try so a failing input poisons only
    // the checks that depend on it (fn_dq_checks_load.sql:48-54 et al.).
    // The three jobs are independent → submitted concurrently; each is a
    // scalar aggregate, so the driver holds three rows, not data.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration

    val expectedSumF = Future(Try {
      silver.agg(coalesce(sum("purchase_amount"), lit(0)).cast("double")).head.getDouble(0)
    })
    val factStatsF = Future(Try {
      val r = fact.agg(
        coalesce(sum("purchase_amount"), lit(0)).cast("double"),
        count(when(col("customer_id").isNull, 1)),
        count(lit(1)),
        count(when(col("effective_to") < col("effective_from"), 1)),
        count(when(col("salary") < 0 || col("salary") > 1000000, 1))
      ).head
      val total = r.getLong(2)
      FactStats(
        r.getDouble(0),
        // COUNT(nulls)*100.0/NULLIF(COUNT(*),0) in IEEE double, as the
        // oracle computes it (fn_dq_checks_load.sql:60-62).
        if (total == 0) None else Some(r.getLong(1).toDouble * 100.0 / total.toDouble),
        r.getLong(3), r.getLong(4))
    })
    val dupGroupsF = Future(Try {
      fact.groupBy("fact_id", "customer_id", "effective_from")
        .count().filter(col("count") > 1).count()
    })
    val expectedSum = Await.result(expectedSumF, Duration.Inf)
    val factStats = Await.result(factStatsF, Duration.Inf)
    val dupGroups = Await.result(dupGroupsF, Duration.Inf)

    val correctness = (expectedSum, factStats) match {
      case (Success(e), Success(f)) =>
        // NULLIF guard: expected == 0 → NULL relative error → failed branch.
        val ok = e != 0 && math.abs(e - f.sum) / e <= 0.01
        Row(1, "correctness", "v_dm_task", null, "Purchase amount sum comparison",
          if (ok) "passed" else "failed", e, f.sum, 0.01,
          if (ok) "Sum difference within acceptable range" else "Sum difference exceeds threshold")
      case (Failure(t), _) => errorRow(1, "correctness", "Purchase amount sum comparison", t)
      case (_, Failure(t)) => errorRow(1, "correctness", "Purchase amount sum comparison", t)
    }

    val completeness = factStats match {
      case Success(f) =>
        val v = f.nullPct
        val ok = v.getOrElse(0.0) <= 5
        Row(2, "completeness", "v_dm_task", "customer_id", "Null values percentage",
          if (ok) "passed" else "failed", null, v.orNull, 5.0,
          if (ok) "Null values within acceptable range" else "Too many null values")
      case Failure(t) => errorRow(2, "completeness", "Null values check", t)
    }

    val consistency = factStats match {
      case Success(f) =>
        val ok = f.badDates == 0
        Row(3, "consistency", "v_dm_task", null, "Date range validation",
          if (ok) "passed" else "failed", null, f.badDates.toDouble, 0.0,
          if (ok) "All date ranges are valid" else "Found invalid date ranges")
      case Failure(t) => errorRow(3, "consistency", "Date range validation", t)
    }

    val uniqueness = dupGroups match {
      case Success(d) =>
        val ok = d == 0
        Row(4, "uniqueness", "v_dm_task", null, "Duplicate records check",
          if (ok) "passed" else "failed", null, d.toDouble, 0.0,
          if (ok) "No duplicate records found" else "Found duplicate records")
      case Failure(t) => errorRow(4, "uniqueness", "Duplicate check", t)
    }

    val validity = factStats match {
      case Success(f) =>
        val ok = f.badSalary == 0
        Row(5, "validity", "v_dm_task", "salary", "Salary range validation",
          if (ok) "passed" else "failed", null, f.badSalary.toDouble, 0.0,
          if (ok) "All salary values are valid" else "Found invalid salary values")
      case Failure(t) => errorRow(5, "validity", "Salary validation", t)
    }

    val checks = Seq(correctness, completeness, consistency, uniqueness, validity)
    val passed = checks.count(_.getString(5) == "passed")
    val failed = checks.size - passed
    val summary = Row(6, "summary", "v_dm_task", null, "Overall DQ check",
      if (failed == 0) "passed" else "failed",
      checks.size.toDouble, passed.toDouble, null,
      s"Total: ${checks.size}, Passed: $passed, Failed: $failed")

    spark.createDataFrame(
      spark.sparkContext.parallelize((checks :+ summary), 1), schema)
  }

  private def errorRow(id: Int, checkType: String, name: String, t: Throwable): Row =
    Row(id, checkType, "v_dm_task", null, name, "error", null, null, null,
      ("Error: " + t.getMessage).take(500))

  /** DuckDB oracle over `silver` + `fact` CTEs producing the identical six
    * rows. Doubles are cast explicitly so both engines do IEEE-double math
    * (DuckDB would otherwise use DECIMAL for the literals). `windowSql`
    * (e.g. " AND effective_from >= DATE '…' AND effective_to <= DATE '…'")
    * mirrors the optional parameters of [[run]].
    */
  def sqlCteWindowed(windowSql: String): String =
    sqlCte
      .replace("FROM silver", s"FROM (SELECT * FROM silver WHERE 1=1$windowSql)")
      .replace("FROM fact", s"FROM (SELECT * FROM fact WHERE 1=1$windowSql)")

  val sqlCte: String =
    """dq_m AS (
      |  SELECT CAST(COALESCE(SUM(purchase_amount), 0) AS DOUBLE) AS exp FROM silver
      |), dq_f AS (
      |  SELECT CAST(COALESCE(SUM(purchase_amount), 0) AS DOUBLE) AS act,
      |         CAST(COUNT(*) FILTER (WHERE customer_id IS NULL) AS DOUBLE) * 100.0
      |           / NULLIF(COUNT(*), 0) AS null_pct,
      |         COUNT(*) FILTER (WHERE effective_to < effective_from) AS bad_dates,
      |         COUNT(*) FILTER (WHERE salary < 0 OR salary > 1000000) AS bad_salary
      |  FROM fact
      |), dq_u AS (
      |  SELECT COUNT(*) AS dup_groups FROM (
      |    SELECT fact_id, customer_id, effective_from
      |    FROM fact GROUP BY 1, 2, 3 HAVING COUNT(*) > 1
      |  )
      |), dq_checks_base AS (
      |  SELECT 1 AS check_id, 'correctness' AS check_type, 'v_dm_task' AS table_name,
      |         CAST(NULL AS VARCHAR) AS column_name,
      |         'Purchase amount sum comparison' AS check_name,
      |         CASE WHEN ABS(exp - act) / NULLIF(exp, 0) <= 0.01 THEN 'passed' ELSE 'failed' END AS status,
      |         exp AS expected_value, act AS actual_value, CAST(0.01 AS DOUBLE) AS error_threshold,
      |         CASE WHEN ABS(exp - act) / NULLIF(exp, 0) <= 0.01
      |              THEN 'Sum difference within acceptable range'
      |              ELSE 'Sum difference exceeds threshold' END AS error_message
      |  FROM dq_m, dq_f
      |  UNION ALL
      |  SELECT 2, 'completeness', 'v_dm_task', 'customer_id', 'Null values percentage',
      |         CASE WHEN COALESCE(null_pct, 0) <= 5 THEN 'passed' ELSE 'failed' END,
      |         CAST(NULL AS DOUBLE), null_pct, CAST(5 AS DOUBLE),
      |         CASE WHEN COALESCE(null_pct, 0) <= 5
      |              THEN 'Null values within acceptable range' ELSE 'Too many null values' END
      |  FROM dq_f
      |  UNION ALL
      |  SELECT 3, 'consistency', 'v_dm_task', CAST(NULL AS VARCHAR), 'Date range validation',
      |         CASE WHEN bad_dates = 0 THEN 'passed' ELSE 'failed' END,
      |         CAST(NULL AS DOUBLE), CAST(bad_dates AS DOUBLE), CAST(0 AS DOUBLE),
      |         CASE WHEN bad_dates = 0 THEN 'All date ranges are valid'
      |              ELSE 'Found invalid date ranges' END
      |  FROM dq_f
      |  UNION ALL
      |  SELECT 4, 'uniqueness', 'v_dm_task', CAST(NULL AS VARCHAR), 'Duplicate records check',
      |         CASE WHEN dup_groups = 0 THEN 'passed' ELSE 'failed' END,
      |         CAST(NULL AS DOUBLE), CAST(dup_groups AS DOUBLE), CAST(0 AS DOUBLE),
      |         CASE WHEN dup_groups = 0 THEN 'No duplicate records found'
      |              ELSE 'Found duplicate records' END
      |  FROM dq_u
      |  UNION ALL
      |  SELECT 5, 'validity', 'v_dm_task', 'salary', 'Salary range validation',
      |         CASE WHEN bad_salary = 0 THEN 'passed' ELSE 'failed' END,
      |         CAST(NULL AS DOUBLE), CAST(bad_salary AS DOUBLE), CAST(0 AS DOUBLE),
      |         CASE WHEN bad_salary = 0 THEN 'All salary values are valid'
      |              ELSE 'Found invalid salary values' END
      |  FROM dq_f
      |), dq_checks AS (
      |  SELECT * FROM dq_checks_base
      |  UNION ALL
      |  SELECT 6, 'summary', 'v_dm_task', CAST(NULL AS VARCHAR), 'Overall DQ check',
      |         CASE WHEN COUNT(*) FILTER (WHERE status <> 'passed') = 0
      |              THEN 'passed' ELSE 'failed' END,
      |         CAST(COUNT(*) AS DOUBLE),
      |         CAST(COUNT(*) FILTER (WHERE status = 'passed') AS DOUBLE),
      |         CAST(NULL AS DOUBLE),
      |         'Total: ' || COUNT(*) || ', Passed: ' || COUNT(*) FILTER (WHERE status = 'passed')
      |           || ', Failed: ' || COUNT(*) FILTER (WHERE status <> 'passed')
      |  FROM dq_checks_base
      |)""".stripMargin

  /** J2: referential-integrity check — fact foreign keys that resolve to no
    * dimension row (left_anti). Zero by construction; the check proves it.
    */
  def refIntegrity(spark: SparkSession, fact: DataFrame, dims: Seq[(String, DataFrame, String)]): DataFrame = {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // four independent anti-join counts — run concurrently
    val counts = dims.map { case (name, dim, idCol) =>
      Future {
        val orphans = fact.filter(col(idCol).isNotNull)
          .join(dim, Seq(idCol), "left_anti").count()
        (name, orphans)
      }
    }
    counts.map(Await.result(_, Duration.Inf)).toDF("dim_name", "orphan_count")
  }

  val refIntegritySql: String =
    """ref_integrity AS (
      |  SELECT 'customer' AS dim_name, COUNT(*) AS orphan_count FROM fact
      |  WHERE customer_id IS NOT NULL AND customer_id NOT IN (SELECT customer_id FROM dim_customer)
      |  UNION ALL
      |  SELECT 'product', COUNT(*) FROM fact
      |  WHERE product_id IS NOT NULL AND product_id NOT IN (SELECT product_id FROM dim_product)
      |  UNION ALL
      |  SELECT 'region', COUNT(*) FROM fact
      |  WHERE region_id IS NOT NULL AND region_id NOT IN (SELECT region_id FROM dim_region)
      |  UNION ALL
      |  SELECT 'status', COUNT(*) FROM fact
      |  WHERE status_id IS NOT NULL AND status_id NOT IN (SELECT status_id FROM dim_status)
      |)""".stripMargin
}
