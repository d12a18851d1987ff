package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** A whole-operator Catalyst extension: per-key top-k without a per-key
  * sort. The equivalent DataFrame formulation —
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k` —
  * shuffles on the keys and then FULLY SORTS every partition
  * (`Exchange → Sort → Window → Filter`); this operator declares the same
  * clustering requirement but replaces Sort+Window with per-key bounded
  * heaps: O(n log k) with O(distinct-keys · k) memory, no spillable full
  * sort. At 100 TB, for small k, the sort is most of the window plan's
  * cost — the heap scan eliminates it entirely.
  *
  * The full custom-operator ladder: [[TopKPerKey]] (logical) is planned
  * by [[TopKStrategy]] (injected via `experimental.extraStrategies` or
  * `SparkSessionExtensions.injectPlannerStrategy`) into
  * [[TopKPerKeyExec]] (physical, `requiredChildDistribution` lets Spark
  * insert the one necessary exchange).
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                      child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ordering = GenerateOrdering.generate(sortOrder, schema)
      // max-heap under the sort order: the root is the WORST retained row,
      // popped when a better one arrives
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reversed())
          heaps.put(key, heap)
        }
        if (heap.size() < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public entry: `TopK.perKey(df, Seq("user_id"), Seq("ts" -> false, "event_id" -> false), 3)`
  * — order pairs are (column, ascending?).
  */
object TopK {

  def registerStrategy(spark: SparkSession): Unit = {
    val es = spark.experimental
    if (!es.extraStrategies.exists(_.isInstanceOf[TopKStrategy]))
      es.extraStrategies = es.extraStrategies :+ new TopKStrategy
  }

  def perKey(spark: SparkSession, df: DataFrame, keyCols: Seq[String],
             orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    registerStrategy(spark)
    val lp = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      lp.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${lp.output.map(_.name)}"))
    val keys = keyCols.map(attr)
    val order = orderCols.map { case (name, asc) =>
      val dir = if (asc) Ascending else Descending
      SortOrder(attr(name), dir, if (asc) NullsFirst else NullsLast, Seq.empty)
    }
    graft.shim.Datasets.ofRows(spark, TopKPerKey(k, keys, order, lp))
  }
}
