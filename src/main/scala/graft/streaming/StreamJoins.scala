package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Synth
import graft.sources.Tables

/** Stream joins — the two join classes Structured Streaming supports and
  * the reference never needed, completing the join inventory:
  *
  *   - STREAM-STATIC: per-event dim enrichment against the broadcast
  *     region lookup chain ([[graft.ops.RegionLookup]]); the static side
  *     ships with every task, the stream is never shuffled for enrichment
  *     and carries no join state.
  *   - STREAM-STREAM interval join: purchases correlated with a
  *     same-user error within the following 10 minutes. BOTH sides carry
  *     watermarks and the join condition bounds event time in both
  *     directions, so each side's buffered state is evicted once the
  *     watermark passes the interval — bounded state by construction, the
  *     thing that separates a runnable 100 TB stream-stream join from one
  *     that accumulates forever.
  *
  * The same builder runs in batch (watermarks are no-ops there), which is
  * how the driver oracle-checks the interval-join semantics; StreamingSpec
  * drives the identical plan through MemoryStream across micro-batches.
  */
object StreamJoins {

  /** Purchases followed by a same-user error within 10 minutes. */
  def purchaseErrorJoin(events: DataFrame): DataFrame = {
    val e = Synth.eventTime(events)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
      .withWatermark("p_ts", "10 minutes")
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "10 minutes")
    purchases.join(errors,
      expr("p_user = e_user AND e_ts >= p_ts AND e_ts <= p_ts + interval 10 minutes"))
      .select(col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("purchase_ts_us"),
        unix_micros(col("e_ts")).as("error_ts_us"),
        col("p_value").as("purchase_value"))
  }

  /** LEFT OUTER form of [[purchaseErrorJoin]]: every purchase emits, with
    * its following error or NULL. In streaming the NULL row cannot emit
    * when the purchase arrives (a match may still come); it emits exactly
    * when the watermark passes the end of the purchase's 10-minute match
    * window — i.e., outer results ride the same state-eviction clock that
    * bounds the join state, which is why outer stream-stream joins REQUIRE
    * the two-sided time bound (StreamingSpec drives this emission timing).
    * Batch runs of the same plan emit NULLs immediately, which is what the
    * driver's DuckDB LEFT JOIN oracle checks.
    */
  def purchaseErrorOuterJoin(events: DataFrame): DataFrame = {
    val e = Synth.eventTime(events)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
      .withWatermark("p_ts", "10 minutes")
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "10 minutes")
    purchases.join(errors,
      expr("p_user = e_user AND e_ts >= p_ts AND e_ts <= p_ts + interval 10 minutes"),
      "leftOuter")
      .select(col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("purchase_ts_us"),
        unix_micros(col("e_ts")).as("error_ts_us"),
        col("p_value").as("purchase_value"),
        col("e_ts").isNotNull.as("had_error"))
  }

  /** Stream-static enrichment: each event resolved through the two-level
    * region lookup (city override → country fallback → Unknown). The dims
    * are broadcast; valid over a streaming `events` frame unchanged.
    */
  def enrichedEvents(spark: SparkSession, events: DataFrame): DataFrame =
    graft.ops.RegionLookup.resolvedEvents(spark, events)

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "purchase_error_join" -> ((s, d) =>
      purchaseErrorJoin(Tables.events(s, d))
        .orderBy(col("user_id"), col("purchase_ts_us"), col("error_ts_us"))),
    "purchase_error_outer" -> ((s, d) =>
      purchaseErrorOuterJoin(Tables.events(s, d))
        .orderBy(col("user_id"), col("purchase_ts_us"), col("error_ts_us"))),
  )

  def oracleSql: Map[String, String] = Map(
    "purchase_error_join" ->
      """SELECT p.user_id,
        |  epoch_us(p.ts) AS purchase_ts_us,
        |  epoch_us(e.ts) AS error_ts_us,
        |  p.value AS purchase_value
        |FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id
        | AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 10 MINUTE
        |ORDER BY p.user_id, purchase_ts_us, error_ts_us""".stripMargin,
    "purchase_error_outer" ->
      """SELECT p.user_id,
        |  epoch_us(p.ts) AS purchase_ts_us,
        |  epoch_us(e.ts) AS error_ts_us,
        |  p.value AS purchase_value,
        |  e.ts IS NOT NULL AS had_error
        |FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id
        | AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 10 MINUTE
        |ORDER BY p.user_id, purchase_ts_us, error_ts_us NULLS FIRST""".stripMargin,
  )
}
