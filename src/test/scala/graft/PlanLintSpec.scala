package graft

import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Expression, If}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, CollectSet, Complete, Partial}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Plan linter over EVERY registered query: builds each physical plan at
  * sf0.001 (pre-AQE `sparkPlan`, which is fully traversable) and fails the
  * build on the three crisp scale anti-patterns that have bitten before:
  *
  *   1. An unpartitioned WindowExec — "Moving all data to a single
  *      partition": the whole input funnels through one task. Allowlisted
  *      only where the window's INPUT is provably tiny by construction
  *      (documented per entry below).
  *   2. A CartesianProductExec — a non-broadcast cross join never belongs
  *      in a registered query.
  *   3. An UNGUARDED `collect_list`/`collect_set` aggregate — the
  *      round-6 `session_paths` lesson: the OUTPUT may be sliced to k,
  *      but the aggregation BUFFER still materializes the whole group
  *      unless the collect's input is conditionally nulled (a
  *      `CASE WHEN rn <= k THEN … END` guard — collect skips NULLs, so
  *      the state is bounded at k). Collects whose group grain is
  *      bounded by construction (a document's own lines, an order's
  *      items, a histogram bucket) are allowlisted with the bound.
  *
  * This is the regression net for plan-shape drift: a new query (or a
  * refactor of an old one) that quietly plans a global window, a
  * cartesian product, or an unbounded collect now fails `sbt test`
  * instead of surfacing in a round's manual plan audit.
  */
class PlanLintSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries allowed an unpartitioned window, each with the reason the
    * single task is safe: the window input is a bounded aggregate, not
    * corpus-grain rows. */
  private val globalWindowAllowed: Map[String, String] = Map(
    "skew_profile" ->
      "window runs over the <=64-row magnitude-bucket histogram",
  )

  /** Queries allowed an unguarded collect_list/collect_set, each with the
    * reason the aggregation buffer is bounded anyway. The common shapes:
    * the group IS the unit being reconstructed (a document's own lines —
    * state is the size of the output row), the algorithm needs the full
    * per-group set (Jaccard over a doc's shingles, an order's item pairs),
    * or the input is already a bounded histogram / sample grain. */
  private val unboundedCollectAllowed: Map[String, String] = Map(
    "line_dedup" ->
      "per-doc line reassembly: buffer = the document being rebuilt",
    "paragraph_dedup" ->
      "per-doc paragraph reassembly: buffer = the document being rebuilt",
    "triangle_count" ->
      "per-order item set: wedge generation needs all pairs; order-bounded",
    "copurchase_similar" ->
      "per-order item set: pair generation needs all pairs; order-bounded",
    "rfm_segments" ->
      "level-2 fold over the O(range/1024) bucket-total histogram",
    "ann_pq_topk" ->
      "codebook assembly: group grain = (subspace, centroid), dim-bounded",
  )

  /** Unguarded collect_list/collect_set aggregate calls in `plan`: the
    * collect's input expression carries no CASE WHEN / IF guard (the
    * NULL-skipping bound), examined in Partial/Complete mode where the
    * original child is visible (Final mode sees only the merge buffer). */
  private def unguardedCollects(plan: SparkPlan): Seq[AggregateExpression] = {
    def guarded(e: Expression): Boolean =
      e.exists { case _: CaseWhen | _: If => true; case _ => false }
    plan.collect { case a: BaseAggregateExec =>
      a.aggregateExpressions.filter { ae =>
        (ae.mode == Partial || ae.mode == Complete) && (ae.aggregateFunction match {
          case c: CollectList => !guarded(c.child)
          case c: CollectSet  => !guarded(c.child)
          case _              => false
        })
      }
    }.flatten
  }

  test("no registered query plans an unpartitioned corpus window, a cartesian product, or an unbounded collect") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.sparkPlan
        val globalWindows = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
        }
        if (globalWindows.nonEmpty && !globalWindowAllowed.contains(name))
          failures += s"$name: unpartitioned window (single-task funnel)"
        val cartesians = plan.collect { case c: CartesianProductExec => c }
        if (cartesians.nonEmpty)
          failures += s"$name: CartesianProductExec in plan"
        val collects = unguardedCollects(plan)
        if (collects.nonEmpty && !unboundedCollectAllowed.contains(name))
          failures += s"$name: unguarded collect aggregate (unbounded buffer): " +
            collects.map(_.aggregateFunction.prettyName).distinct.mkString(",")
      } catch {
        case e: Throwable => failures += s"$name: plan build failed: ${e.getMessage}"
      } finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the unguarded-collect rule fires on a deliberately unbounded fixture") {
    import org.apache.spark.sql.functions._
    val df = spark.range(100).select((col("id") % 3).as("k"), col("id").as("v"))
    val unbounded = df.groupBy(col("k")).agg(collect_list(col("v")).as("vs"))
    assert(unguardedCollects(unbounded.queryExecution.sparkPlan).nonEmpty,
      "lint must flag a bare collect_list")
    val guarded = df
      .withColumn("rn", expr(
        "row_number() over (partition by k order by v)"))
      .groupBy(col("k"))
      .agg(collect_list(expr("CASE WHEN rn <= 8 THEN v END")).as("vs"))
    assert(unguardedCollects(guarded.queryExecution.sparkPlan).isEmpty,
      "lint must accept the CASE WHEN rn <= k guard")
  }
}
