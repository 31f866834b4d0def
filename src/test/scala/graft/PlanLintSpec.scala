package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Plan linter over EVERY registered query: builds each physical plan at
  * sf0.001 (pre-AQE `sparkPlan`, which is fully traversable) and fails the
  * build on the two crisp scale anti-patterns that have bitten before:
  *
  *   1. An unpartitioned WindowExec — "Moving all data to a single
  *      partition": the whole input funnels through one task. Allowlisted
  *      only where the window's INPUT is provably tiny by construction
  *      (documented per entry below).
  *   2. A CartesianProductExec — a non-broadcast cross join never belongs
  *      in a registered query.
  *
  * This is the regression net for plan-shape drift: a new query (or a
  * refactor of an old one) that quietly plans a global window or a
  * cartesian product now fails `sbt test` instead of surfacing in a
  * round's manual plan audit.
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

  test("no registered query plans an unpartitioned corpus window or a cartesian product") {
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
      } catch {
        case e: Throwable => failures += s"$name: plan build failed: ${e.getMessage}"
      } finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
