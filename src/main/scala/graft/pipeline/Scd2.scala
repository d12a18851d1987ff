package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the versioned-history
  * semantics the reference's schema declares on every layer
  * (`effective_from`/`effective_to`/`current_flag`,
  * `/root/reference/sql/init/01_init_all.sql:15-18,34-37`) but whose
  * loader only ever window-reloads. This operator supplies the missing
  * write pattern: apply an as-of batch of attribute values to the
  * CURRENT version set,
  *
  *  - unchanged keys keep their row untouched;
  *  - changed keys close the current row (`effective_to = asOf − 1 day`,
  *    `current_flag = false`) and open a new version;
  *  - unseen keys open their first version.
  *
  * Open versions carry `effective_to = NULL` (the "no end" SCD2
  * convention) rather than a 9999-12-31 sentinel: NULL survives every
  * engine/format hop, while the sentinel overflows nanosecond-epoch
  * timestamp ranges in arrow/pandas-side consumers.
  *
  * Scale: one keyed full-outer join on the natural key plus a union —
  * both sides are dimension-sized and hash-partition by `nk`; history
  * rows never participate (the caller unions them back), so cost tracks
  * the CURRENT set + batch, not accumulated history.
  */
object Scd2 {

  /** Apply `updates` (one row per natural key: nk + attrs) to the
    * current-version set `current` (nk, attrs, effective_from,
    * effective_to, current_flag — every row open) as of `asOf`.
    */
  def merge(current: DataFrame, updates: DataFrame, nk: String,
            attrs: Seq[String], asOf: LocalDate): DataFrame = {
    val asOfLit = lit(java.sql.Date.valueOf(asOf))
    val closedTo = lit(java.sql.Date.valueOf(asOf.minusDays(1)))
    val u = updates.select(
      (col(nk).as("u_nk") +: attrs.map(a => col(a).as(s"u_$a"))): _*)
    val j = current.join(u, col(nk) === col("u_nk"), "full_outer")
    // null-safe per-attribute comparison: a NULL→value or value→NULL
    // transition is a change, NULL→NULL is not
    val changed = attrs.map(a => !(col(a) <=> col(s"u_$a"))).reduce(_ || _)
    val hasCur = col(nk).isNotNull
    val hasUpd = col("u_nk").isNotNull

    val kept = j.filter(hasCur).select(
      (col(nk) +: attrs.map(col)) ++ Seq(
        col("effective_from"),
        when(hasUpd && changed, closedTo)
          .otherwise(col("effective_to")).as("effective_to"),
        when(hasUpd && changed, lit(false))
          .otherwise(col("current_flag")).as("current_flag")): _*)
    val opened = j.filter(hasUpd && (!hasCur || changed)).select(
      (col("u_nk").as(nk) +: attrs.map(a => col(s"u_$a").as(a))) ++ Seq(
        asOfLit.as("effective_from"),
        lit(null).cast("date").as("effective_to"),
        lit(true).as("current_flag")): _*)
    kept.unionByName(opened)
  }

  // ---------- registered query: user attribute history from silver ----------

  private val H1 = ("2023-01-01", "2023-06-30")
  private val H2 = ("2023-07-01", "2023-12-31")

  /** Latest (region, customer_status) per user within a date window —
    * deterministic: latest `effective_from`, then highest `id`.
    */
  private def latestState(silver: DataFrame, from: String,
                          to: String): DataFrame = {
    val w = Window.partitionBy("user_name")
      .orderBy(col("effective_from").desc, col("id").desc)
    silver
      .filter(col("user_name").isNotNull &&
        col("effective_from").between(to_date(lit(from)), to_date(lit(to))))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_name", "region", "customer_status")
  }

  /** SCD2 history of per-user (region, status): H1-2023 state as the
    * opening versions, H2-2023 state applied as of 2024-01-01.
    */
  def userHistory(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "scd2_users", dir, "scd2_users") {
      val silver = Pipeline.silverCached(spark, dir)
      val current = latestState(silver, H1._1, H1._2)
        .withColumn("effective_from", to_date(lit(H1._1)))
        .withColumn("effective_to", lit(null).cast("date"))
        .withColumn("current_flag", lit(true))
      val updates = latestState(silver, H2._1, H2._2)
      merge(current, updates, "user_name", Seq("region", "customer_status"),
        LocalDate.parse("2024-01-01"))
    }

  /** DuckDB twin of [[userHistory]] over the silver CTE chain. */
  def userHistorySql: String = {
    def latest(from: String, to: String): String =
      s"""SELECT user_name, region, customer_status FROM (
         |  SELECT user_name, region, customer_status,
         |         row_number() OVER (PARTITION BY user_name
         |           ORDER BY effective_from DESC, id DESC) AS rn
         |  FROM silver
         |  WHERE user_name IS NOT NULL
         |    AND effective_from BETWEEN DATE '$from' AND DATE '$to'
         |) WHERE rn = 1""".stripMargin
    val changed = "(c_r IS DISTINCT FROM u_r OR c_s IS DISTINCT FROM u_s)"
    s"""${Pipeline.silverPrefix}
       |, cur AS (${latest(H1._1, H1._2)})
       |, upd AS (${latest(H2._1, H2._2)})
       |, j AS (
       |  SELECT cur.user_name AS c_nk, cur.region AS c_r,
       |         cur.customer_status AS c_s,
       |         upd.user_name AS u_nk, upd.region AS u_r,
       |         upd.customer_status AS u_s
       |  FROM cur FULL OUTER JOIN upd ON cur.user_name = upd.user_name
       |)
       |SELECT c_nk AS user_name, c_r AS region, c_s AS customer_status,
       |       DATE '${H1._1}' AS effective_from,
       |       CASE WHEN u_nk IS NOT NULL AND $changed
       |            THEN DATE '2023-12-31' END AS effective_to,
       |       NOT (u_nk IS NOT NULL AND $changed) AS current_flag
       |FROM j WHERE c_nk IS NOT NULL
       |UNION ALL
       |SELECT u_nk, u_r, u_s, DATE '2024-01-01', NULL, TRUE
       |FROM j WHERE u_nk IS NOT NULL AND (c_nk IS NULL OR $changed)""".stripMargin
  }
}
