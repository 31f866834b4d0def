package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per group, planned as a
  * PARTIAL per-partition pass before the shuffle and a FINAL pass after it —
  * the aggregate-style two-phase shape that the equivalent window query
  * (`row_number() OVER (PARTITION BY g ORDER BY o) <= k`) cannot produce.
  *
  * Why this exists: Spark's own `WindowGroupLimit` optimization (which
  * rewrites rank-filter windows) still shuffles every surviving row AND
  * SORTS each partition, because the window contract needs full per-group
  * order. A dedicated operator knows only k rows per group survive, so the
  * partial stage reduces shuffle input to ≤ k rows per (partition, group)
  * with NO sort — per-partition bounded heaps — and the final stage merges
  * heaps per group. At 100 TB with G groups and P map partitions, shuffle
  * volume drops from N rows to min(N, P·G·k), and the O(n log n) sorts
  * become O(n log k) heap maintenance.
  *
  * Memory: each task holds ≤ (groups-in-partition × k) rows. That is the
  * hash-aggregate memory shape; a production version would add spilling
  * (sort-based fallback) exactly as `HashAggregateExec` does.
  *
  * This is rung (c) of the extension ladder (expression → optimizer rule →
  * whole operator): logical node + planner strategy + physical operator,
  * registered through [[GraftExtensions]].
  */
object TopK {

  /** Logical node. `order` must be resolved attributes of `child`; the
    * public API [[topKPerGroup]] resolves by name so the node is born
    * resolved and flows through the analyzer/optimizer untouched. */
  case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
      k: Int, child: LogicalPlan) extends UnaryNode {
    require(k > 0, s"k must be positive, got $k")
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
      copy(child = newChild)
  }

  /** Planner strategy: one logical node → partial exec below the (implicit)
    * exchange, final exec above it. EnsureRequirements inserts the hash
    * exchange on the group keys because the final node requires
    * [[ClusteredDistribution]] while the partial's output is unspecified. */
  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroup(g, o, k, child) =>
        TopKPerGroupExec(g, o, k, partial = false,
          TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
      k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(groupExprs) :: Nil

    override def nodeName: String =
      if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

    override protected def doExecute(): RDD[InternalRow] = {
      val schema = child.output
      val g = groupExprs
      val o = order
      val limit = k
      val emitSorted = !partial
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(g, schema)
        val base = RowOrdering.create(o, schema)
        val ord = new Ordering[UnsafeRow] {
          override def compare(a: UnsafeRow, b: UnsafeRow): Int = base.compare(a, b)
        }
        // Per group: a max-heap of the k best-so-far rows under `order`
        // (head = current worst). A row displaces the head iff it sorts
        // strictly before it — O(log k) per row, no partition sort.
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
        iter.foreach { row =>
          val u = row.asInstanceOf[UnsafeRow]
          val key = keyProj(u)
          heaps.get(key) match {
            case None =>
              val h = mutable.PriorityQueue.empty[UnsafeRow](ord)
              h.enqueue(u.copy())
              heaps.put(key.copy(), h)
            case Some(h) =>
              if (h.size < limit) h.enqueue(u.copy())
              else if (ord.compare(u, h.head) < 0) { h.dequeue(); h.enqueue(u.copy()) }
          }
        }
        heaps.valuesIterator.flatMap { h =>
          // Final stage emits each group's survivors in `order` (cheap:
          // k log k per group); partial output order is irrelevant — it
          // only feeds the final heaps.
          if (emitSorted) h.dequeueAll.reverseIterator
          else h.iterator
        }
      }
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
      copy(child = newChild)
  }

  /** Public API: keep the top `k` rows per group under `orderBy`, resolved
    * by column name against `df` (name → (column, ascending?)). Equivalent
    * to the `row_number` window filter, planned as partial+final heaps.
    */
  def topKPerGroup(df: DataFrame, groupBy: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = GraftPlanBridge.analyzed(df)
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftPlanBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupBy.map(attr), order, k, child))
  }
}
