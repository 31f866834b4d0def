package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Incremental materialized-view maintenance: keep a per-(user, day)
  * aggregate table current by MERGING each new batch's partial aggregates
  * into the stored state — the fact table is never rescanned.
  *
  * This is the batch analog of what the reference's streaming windows do
  * continuously (kpi/region frames hold running aggregates per window;
  * reference: src/streaming/kpi_aggregator.py), and the lakehouse pattern
  * a 100 TB deployment actually runs: nightly facts land as a delta
  * partition, the view update costs O(|state| + |delta|) with one shuffle
  * on the group key, while a full recompute costs a 100 TB scan. The
  * registered query PROVES merge == recompute: it computes the view as
  * base-state ∪ delta-state → re-aggregate, and the DuckDB oracle computes
  * the same view in one pass over all facts — a hash match IS the
  * maintenance-correctness theorem for this aggregate algebra.
  *
  * Only mergeable aggregates appear (count → sum, sum → sum, max → max);
  * exact count-distinct is deliberately absent — it is not mergeable, and
  * the engine's mergeable-sketch rollups ([[Frames.hllRollup]],
  * [[graft.functions.Sketches]]) are the scale answer for it. Monetary
  * values are scaled to integer cents (`floor(value·100)` — exact on
  * bit-identical doubles) so the merge is associative to the bit; summing
  * raw doubles would make base+delta vs one-pass differ in float
  * association order.
  */
object Incremental {

  /** The per-(user, day) aggregate state for one slice of the fact table —
    * the shape stored in the view table, all columns mergeable. */
  def dailyState(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).cast("long").as("sum_cents"),
        max(col("cents")).as("max_cents"))

  /** Maintenance cutoff splitting the fixture into "stored state" (first
    * ~3 weeks) and "newly landed delta" (the rest). */
  val Cutoff = "2024-01-24 00:00:00"

  /** The maintained view after merging the delta batch into the base
    * state. Merge algebra: n += n, sum += sum, max = greatest — one
    * shuffle on (user_id, day), partial-aggregated map-side. */
  def aggDeltaMerge(events: DataFrame): DataFrame = {
    val cut = lit(Cutoff).cast("timestamp")
    val base = dailyState(events.filter(col("ts") < cut))
    val delta = dailyState(events.filter(col("ts") >= cut))
    base.unionByName(delta)
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("n_events")).cast("long").as("n_events"),
        sum(col("sum_cents")).cast("long").as("sum_cents"),
        max(col("max_cents")).as("max_cents"))
      .select(col("user_id"), unix_micros(col("day")).as("day_us"),
        col("n_events"), col("sum_cents"), col("max_cents"))
      .orderBy(col("user_id"), col("day_us"))
  }

  /** Incremental JOIN-view maintenance — the delta-join rule, the second
    * IVM algebra next to [[aggDeltaMerge]]'s aggregate merge. The view is
    * revenue per nation (orders ⋈ customer → group by nation). Under a
    * fact-only insert batch ΔO, the standard IVM identity
    *
    *   V(O ∪ ΔO) = V(O) + (ΔO ⋈ customer)
    *
    * holds because join distributes over union and the aggregate is
    * mergeable — so maintenance joins ONLY the delta against the
    * dimension (O(|Δ|) join work + an O(|state|+|groups|) merge), while a
    * recompute joins the full fact history. At 100 TB the delta join is a
    * broadcast of nothing new: the dimension side is the same customer
    * table every night, and the merge shuffles view-grain rows, not
    * facts. The oracle is the FULL RECOMPUTE over orders ∪ delta —
    * equality is the delta-join correctness theorem. Money in integer
    * cents, same as the aggregate view.
    */
  val OrderCutoffDate = "1995-01-01"

  def joinDeltaMerge(orders: DataFrame, customer: DataFrame): DataFrame = {
    val dim = customer.select(col("c_custkey"), col("c_nationkey"))
    def revenue(facts: DataFrame): DataFrame = facts
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).cast("long").as("rev_cents"))
    val cut = lit(OrderCutoffDate).cast("date")
    val base = revenue(orders.filter(col("o_orderdate") < cut))
    val delta = revenue(orders.filter(col("o_orderdate") >= cut))
    base.unionByName(delta)
      .groupBy(col("c_nationkey"))
      .agg(sum(col("n_orders")).cast("long").as("n_orders"),
        sum(col("rev_cents")).cast("long").as("rev_cents"))
      .orderBy(col("c_nationkey"))
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_delta_merge" -> ((s, d) => aggDeltaMerge(Tables.events(s, d))),
    "join_delta_merge" -> ((s, d) =>
      joinDeltaMerge(Tables.orders(s, d), Tables.customer(s, d))),
  )

  /** The oracle is the FULL RECOMPUTE — equality proves the incremental
    * merge maintains the view exactly. */
  def oracleSql: Map[String, String] = Map(
    "agg_delta_merge" ->
      """SELECT user_id,
        |  epoch_us(date_trunc('day', ts)) AS day_us,
        |  count(*) AS n_events,
        |  sum(floor(value * 100)::BIGINT)::BIGINT AS sum_cents,
        |  max(floor(value * 100)::BIGINT) AS max_cents
        |FROM events
        |GROUP BY user_id, date_trunc('day', ts)
        |ORDER BY user_id, day_us""".stripMargin,
    "join_delta_merge" ->
      """SELECT c_nationkey,
        |  count(*)::BIGINT AS n_orders,
        |  sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS rev_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
  )
}
