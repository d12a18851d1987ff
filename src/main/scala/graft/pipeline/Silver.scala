package graft.pipeline

import java.time.LocalDate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver layer: the reference's set-based cleanse `fn_etl_data_load`
  * (`sql/init/01_init_all.sql:63-141`) re-expressed as one declarative
  * `select` of `when/otherwise` chains — Catalyst folds the whole thing
  * into a single whole-stage-codegen'd projection over the bronze scan,
  * which is the Spark analog of the reference's one deliberate
  * optimization (one server-side INSERT..SELECT instead of a client loop).
  *
  * Semantic quirks preserved deliberately (SURVEY.md §7.5):
  *  - The `effective_to` repair compares against the ORIGINAL
  *    `effective_from` (SQL CASE sees the source row), so a row whose
  *    `from` is floored to 2023-01-01 can still end with `to` < `from`
  *    (`01_init_all.sql:121-129`). Do not "fix".
  *  - `product_category NOT IN (...)` is null-propagating: NULL category
  *    stays NULL (falls to ELSE), it does NOT become 'Other'
  *    (`01_init_all.sql:103-107`).
  *  - Duplicates are NOT removed here — the uniqueness DQ check detects
  *    them downstream (`fn_dq_checks_load.sql:121-156`).
  *
  * The optional date window replicates `(start_dt IS NULL OR ...)` (P3):
  * built conditionally in Scala so a set bound becomes a plain range
  * predicate that reaches the parquet scan / prunes date partitions,
  * instead of a literal `IS NULL OR` disjunction that would block pruning.
  */
object Silver {

  val categories: Seq[String] = Seq("Electronics", "Clothing", "Books", "Home", "Sports")

  def cleanse(bronze: DataFrame,
              startDate: Option[LocalDate] = None,
              endDate: Option[LocalDate] = None): DataFrame = {
    val windowed = Seq(
      startDate.map(d => col("effective_from") >= lit(java.sql.Date.valueOf(d))),
      endDate.map(d => col("effective_to") <= lit(java.sql.Date.valueOf(d)))
    ).flatten.foldLeft(bronze.filter(col("user_id").isNotNull))(_ filter _)

    windowed.select(
      col("id"),
      col("user_id"),
      col("user_name"),
      when(col("age").isNull, 25)
        .when(col("age") < 18, 18)
        .when(col("age") > 100, 100)
        .otherwise(col("age")).as("age"),
      when(col("salary") < 0, 0)
        .when(col("salary") > 1000000, 1000000)
        .otherwise(round(col("salary"), 2))
        .cast("decimal(15,2)").as("salary"),
      when(col("purchase_amount") < 0, 0)
        .when(col("purchase_amount") > 100000, 100000)
        .otherwise(round(col("purchase_amount"), 2))
        .cast("decimal(15,2)").as("purchase_amount"),
      when(not(col("product_category").isin(categories: _*)), "Other")
        .otherwise(col("product_category")).as("product_category"),
      col("region"),
      when(col("customer_status").isNull, "unknown")
        .otherwise(lower(col("customer_status"))).as("customer_status"),
      when(col("transaction_count") < 0, 0)
        .when(col("transaction_count") > 1000, 1000)
        .otherwise(col("transaction_count")).as("transaction_count"),
      when(col("effective_from") < to_date(lit("2020-01-01")), to_date(lit("2023-01-01")))
        .otherwise(col("effective_from")).as("effective_from"),
      when(col("effective_to") < col("effective_from"), date_add(col("effective_from"), 30))
        .when(col("effective_to") > to_date(lit("2024-12-31")), to_date(lit("2024-12-31")))
        .otherwise(col("effective_to")).as("effective_to"),
      col("current_flag")
    )
  }

  /** DuckDB oracle rendering; `windowSql` e.g.
    * " AND effective_from >= DATE '2023-01-01' AND effective_to <= DATE '2023-12-31'".
    */
  def sqlCte(windowSql: String = ""): String =
    s"""silver AS (
       |  SELECT id, user_id, user_name,
       |    CASE WHEN age IS NULL THEN 25 WHEN age < 18 THEN 18 WHEN age > 100 THEN 100
       |         ELSE age END AS age,
       |    CAST(CASE WHEN salary < 0 THEN 0 WHEN salary > 1000000 THEN 1000000
       |              ELSE ROUND(salary, 2) END AS DECIMAL(15,2)) AS salary,
       |    CAST(CASE WHEN purchase_amount < 0 THEN 0 WHEN purchase_amount > 100000 THEN 100000
       |              ELSE ROUND(purchase_amount, 2) END AS DECIMAL(15,2)) AS purchase_amount,
       |    CASE WHEN product_category NOT IN ('Electronics','Clothing','Books','Home','Sports')
       |         THEN 'Other' ELSE product_category END AS product_category,
       |    region,
       |    CASE WHEN customer_status IS NULL THEN 'unknown'
       |         ELSE LOWER(customer_status) END AS customer_status,
       |    CASE WHEN transaction_count < 0 THEN 0 WHEN transaction_count > 1000 THEN 1000
       |         ELSE transaction_count END AS transaction_count,
       |    -- b.-qualified so DuckDB's lateral column aliases cannot rebind the
       |    -- CASE to the repaired value (PG CASE sees the source row; quirk kept).
       |    CASE WHEN b.effective_from < DATE '2020-01-01' THEN DATE '2023-01-01'
       |         ELSE b.effective_from END AS effective_from,
       |    CASE WHEN b.effective_to < b.effective_from THEN b.effective_from + 30
       |         WHEN b.effective_to > DATE '2024-12-31' THEN DATE '2024-12-31'
       |         ELSE b.effective_to END AS effective_to,
       |    current_flag
       |  FROM bronze b
       |  WHERE user_id IS NOT NULL$windowSql
       |)""".stripMargin
}
