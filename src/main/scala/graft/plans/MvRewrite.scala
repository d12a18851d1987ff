package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DateType

/** Materialized-view auto-rewrite — the transparent-MV-serving feature
  * of warehouse optimizers (Calcite/BigQuery/Snowflake style), built the
  * Spark-first way: a `Rule[LogicalPlan]` that recognizes the daily
  * per-type count aggregate
  *
  * {{{ events.groupBy(to_date(ts), event_type).count() }}}
  *
  * over the registered events source and replaces the whole aggregate
  * with a scan of the pre-materialized rollup parquet — turning a
  * full-corpus scan + shuffle into a days×types-row metadata read. Any
  * registered query that builds this exact shape over the same source
  * (the trend, anomaly, and CUSUM inputs all do) is served from the MV
  * transparently, which is the point of the feature: the QUERY does not
  * change, the PLAN does.
  *
  * Safety: the rule fires only on an exact structural match — grouping
  * exprs are precisely `cast(ts as date)` (what `to_date` compiles to)
  * and the bare `event_type` column, the single aggregate is
  * `count(1)`, every projection between the aggregate and the relation
  * passes `ts`/`event_type` through UNtransformed, there is no Filter
  * anywhere below (a filtered aggregate must not read the unfiltered
  * MV), and the relation's file path is the events source the MV was
  * built from. Output attribute ids are pinned onto the replacement
  * Project so parent operators resolve unchanged. The MV is built (or
  * refreshed) immediately before registration in the same session, so
  * staleness cannot arise in the driver contract.
  */
case class MvRewriteRule(eventsPath: String, mvPlan: LogicalPlan,
                         mvCols: Seq[String]) extends Rule[LogicalPlan] {

  private def isEventsRelation(p: LogicalPlan): Boolean = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        // scheme-insensitive EQUALITY of the normalized path (never
        // substring containment: 'events.parquet_old' or a nested copy
        // must not be silently served from this MV)
        fs.location.rootPaths.exists(rp =>
          rp.toUri.getPath == MvRewrite.normalizePath(eventsPath))
      case _ => false
    }
    case _ => false
  }

  /** The attr must flow from the relation through projections unchanged
    * (a bare AttributeReference at every level — any Alias over a
    * computed expression disqualifies the match).
    */
  private def passesThrough(attr: AttributeReference, p: LogicalPlan): Boolean =
    p match {
      case Project(list, child) =>
        list.exists {
          case a: AttributeReference => a.exprId == attr.exprId
          case _ => false
        } && child.output.exists(_.exprId == attr.exprId) && passesThrough(attr, child)
      case rel if isEventsRelation(rel) => rel.output.exists(_.exprId == attr.exprId)
      case _ => false
    }

  private def hasFilterBelow(p: LogicalPlan): Boolean =
    p.collectFirst { case _: Filter => true }.isDefined

  private object DateOfTs {
    /** `to_date(ts)` after optimization: a Cast to date over `ts`, with
      * at most one intermediate Cast (the NTZ→timestamp normalization
      * [[graft.Tables.normalizeEventTs]] inserts on NTZ-encoded files —
      * that branch asserts the UTC session zone, so the composition is
      * still exactly the calendar date of the stored instant).
      */
    private def tsUnderCasts(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference if a.name == "ts" => Some(a)
      case Cast(inner, _, _, _) => tsUnderCasts(inner)
      case _ => None
    }
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case Alias(c @ Cast(_, DateType, _, _), _) => tsUnderCasts(c)
      case c @ Cast(_, DateType, _, _) => tsUnderCasts(c)
      case _ => None
    }
  }

  private object CountOne {
    def unapply(e: Expression): Boolean = e match {
      case AggregateExpression(Count(Seq(Literal(1, _))), _, false, None, _) => true
      case _ => false
    }
  }

  /** g1 is either the date cast itself or (after the optimizer's
    * PullOutGroupingExpressions) an attribute whose defining Alias in
    * the child Project is the date cast — resolve through either.
    */
  private def resolvesToDateOfTs(e: Expression, child: LogicalPlan): Boolean =
    e match {
      case DateOfTs(ts) => passesThrough(ts, child)
      case a: AttributeReference => child match {
        case Project(list, grand) =>
          list.exists {
            case al: Alias if al.exprId == a.exprId =>
              DateOfTs.unapply(al).exists(ts => passesThrough(ts, grand))
            case ar: AttributeReference if ar.exprId == a.exprId =>
              resolvesToDateOfTs(a, grand)
            case _ => false
          }
        case _ => false
      }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Seq(g1, g2: AttributeReference),
                         aggExprs, child, _)
        if g2.name == "event_type" &&
          !hasFilterBelow(child) &&
          resolvesToDateOfTs(g1, child) && passesThrough(g2, child) &&
          matchesOutputs(aggExprs, g1, g2) =>
      val fresh = mvNewInstance()
      val byName = fresh.output.map(a => a.name -> a).toMap
      Project(
        agg.output.zip(mvCols).map { case (orig, mvName) =>
          Alias(byName(mvName), orig.name)(exprId = orig.exprId)
        }, fresh)
  }

  /** Aggregate list must be exactly [the two grouping outputs, count(1)]. */
  private def matchesOutputs(aggExprs: Seq[NamedExpression],
                             g1: Expression, g2: Expression): Boolean =
    aggExprs.length == 3 && {
      def refsG1(a: AttributeReference): Boolean = g1 match {
        case al: Alias => al.exprId == a.exprId
        case g: AttributeReference => g.exprId == a.exprId
        case _ => false
      }
      val dateOk = aggExprs(0) match {
        case DateOfTs(_) => true
        case a: AttributeReference => refsG1(a)
        case Alias(a: AttributeReference, _) => refsG1(a)
        case _ => false
      }
      val typeOk = aggExprs(1) match {
        case a: AttributeReference => a.name == "event_type"
        case _ => false
      }
      val cntOk = aggExprs(2) match {
        case Alias(CountOne(), _) => true
        case _ => false
      }
      dateOk && typeOk && cntOk
    }

  /** Fresh attribute ids per rewrite site so two rewrites in one query
    * cannot collide.
    */
  private def mvNewInstance(): LogicalPlan = mvPlan match {
    case lr: LogicalRelation => lr.newInstance()
    case other => other
  }
}

object MvRewrite {

  /** Normalized (scheme-less) form of a path for relation matching. */
  private[plans] def normalizePath(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Detach any live rewrite rule for `dir`'s events source. */
  def deregister(spark: SparkSession, dir: String): Unit = {
    val eventsPath = s"$dir/events.parquet"
    val es = spark.experimental
    es.extraOptimizations = es.extraOptimizations.filterNot {
      case MvRewriteRule(p, _, _) => p == eventsPath
      case _ => false
    }
  }

  /** Build/refresh the daily-count MV for `dir` under `mvDir`, then
    * idempotently attach the rewrite rule for that source.
    */
  def materializeAndRegister(spark: SparkSession, dir: String,
                             mvDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val eventsPath = s"$dir/events.parquet"
    val es = spark.experimental
    // CRITICAL ordering: drop any live rule for this source BEFORE the
    // rebuild — the MV-build query is itself MV-eligible, and a live
    // rule would rewrite it to READ the very directory the overwrite is
    // deleting (self-clobber: empty MV, failed scans)
    deregister(spark, dir)
    graft.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(mvDir)
    // drop any cached listing of a previous MV generation for this path
    spark.catalog.refreshByPath(mvDir)
    val mvPlan = spark.read.parquet(mvDir).queryExecution.analyzed
    es.extraOptimizations = es.extraOptimizations :+
      MvRewriteRule(eventsPath, mvPlan, Seq("event_date", "event_type", "n"))
  }

  /** Driver check: materialize + register, then run the PLAIN aggregate —
    * the optimizer must serve it from the MV (spec asserts the plan; the
    * oracle is the plain GROUP BY, which the MV content equals by
    * construction).
    */
  def check(spark: SparkSession, dir: String): DataFrame = {
    val mvDir = graft.io.FsUtil.stateDir("mv", dir) + "/daily"
    materializeAndRegister(spark, dir, mvDir)
    // Execute the MV-served plan NOW (the rewrite fires inside this
    // action — the checkpointed rows come from the MV scan), then
    // DETACH the rule: leaving it live would silently serve every later
    // daily-count-shaped query in the session from the MV, skewing
    // per-query bench attribution and turning into a staleness bug if
    // events were ever rewritten in-session. The plan-shape proof lives
    // in MvRewriteSpec, which inspects the plan before executing.
    val served = dailyCounts(spark, dir).localCheckpoint(eager = true)
    deregister(spark, dir)
    served
  }

  /** Persisted + incrementally maintained variant: the daily rollup
    * lives as a versioned [[graft.io.AtomicPublish]] artifact (not a
    * per-session rebuild), each cycle recomputes ONLY the newest day —
    * a pushable `ts ≥ cutoff` scan — and folds it in by
    * day-replacement (idempotent: re-running a day overwrites it with
    * identical content), and the plain aggregate is then served from
    * the COMMITTED artifact through the same rewrite rule. This is the
    * lakehouse MV lifecycle end-to-end: scheduled incremental refresh +
    * transparent serving, behind one atomic pointer. The oracle is the
    * full GROUP BY recompute, so a fold that dropped or doubled a day
    * diverges.
    */
  def incrementalCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "events_daily_mv_incremental", dir, "mv_state") {
      import org.apache.spark.sql.functions._
      import graft.io.AtomicPublish
      val base = graft.io.FsUtil.stateDir("mv_state", dir)
      def rollup(df: DataFrame) = df
        .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val cutoff = graft.Tables.events(spark, dir)
        .agg(max(to_date(col("ts")))).head().getDate(0)
      if (!AtomicPublish.exists(spark, base))
        AtomicPublish.publish(spark, base, Seq("daily" ->
          rollup(graft.Tables.events(spark, dir)
            .filter(col("ts") < lit(cutoff).cast("timestamp")))))
      val newDay = rollup(graft.Tables.events(spark, dir)
        .filter(col("ts") >= lit(cutoff).cast("timestamp")))
      val merged = AtomicPublish.read(spark, base, "daily")
        .filter(col("event_date") < lit(cutoff))
        .unionByName(newDay)
      AtomicPublish.publish(spark, base, Seq("daily" -> merged))
      // serve the plain aggregate from the committed artifact via the
      // rewrite rule; detach afterwards (same lifetime discipline as
      // check(), and the result is materialized before the next fold
      // could prune the version it reads)
      val eventsPath = s"$dir/events.parquet"
      deregister(spark, dir)
      val mvPlan = AtomicPublish.read(spark, base, "daily")
        .queryExecution.analyzed
      val es = spark.experimental
      es.extraOptimizations = es.extraOptimizations :+
        MvRewriteRule(eventsPath, mvPlan, Seq("event_date", "event_type", "n"))
      val served = dailyCounts(spark, dir).localCheckpoint(eager = true)
      deregister(spark, dir)
      served
    }

  /** The canonical MV-eligible query shape (shared with the spec). */
  def dailyCounts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  val checkSql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
      |       CAST(COUNT(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2""".stripMargin
}
