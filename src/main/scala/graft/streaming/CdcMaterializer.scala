package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC materialization: maintain the current row per key from a
  * Debezium-style op stream — the stateful streaming counterpart of the
  * batch compaction in [[graft.sources.Cdc.snapshot]] (reference consumes
  * the same op envelope: src/streaming/kafka_sources.py:84-99).
  *
  * Same discipline as [[AlertStateMachine]]: a pure last-writer-wins step
  * function (unit-testable without Spark) folded into `mapGroupsWithState`,
  * keyed by the primary key, update output mode. Out-of-order and
  * cross-batch stale ops are ignored by (source ts, log offset) comparison
  * — replaying a batch is idempotent. Deletes are retained as tombstone
  * rows (`deleted=true`) so a downstream upsert sink can propagate the
  * removal; a sink that only wants live rows filters them.
  *
  * Scale: state is one small row per LIVE key, partitioned by the key —
  * the same cardinality any keyed state backend carries for this job; at
  * 100 TB the state store shards with the shuffle partitioning (RocksDB
  * state store in production).
  */
object CdcMaterializer {

  /** One change event: key + (source ts, log offset) + payload. */
  final case class CdcOp(key: Long, tsMs: Long, eventId: Long, op: String,
      value: Double, deleted: Boolean)

  /** Per-key persistent state = the winning op so far. */
  final case class RowState(tsMs: Long, eventId: Long, op: String,
      value: Double, deleted: Boolean)

  /** Emitted view row; `deleted=true` is a tombstone. */
  final case class Materialized(key: Long, tsMs: Long, eventId: Long,
      op: String, value: Double, deleted: Boolean)

  /** Pure last-writer-wins merge: the op wins iff strictly newer by
    * (source ts, log offset) — so replays and out-of-order arrivals are
    * no-ops.
    */
  def step(state: Option[RowState], op: CdcOp): RowState = state match {
    case Some(s) if s.tsMs > op.tsMs || (s.tsMs == op.tsMs && s.eventId >= op.eventId) => s
    case _ => RowState(op.tsMs, op.eventId, op.op, op.value, op.deleted)
  }

  /** Fold one micro-batch of a key's ops into its state. */
  def updateGroup(key: Long, ops: Iterator[CdcOp],
      state: GroupState[RowState]): Materialized = {
    var s = state.getOption
    ops.toSeq.sortBy(o => (o.tsMs, o.eventId)).foreach(o => s = Some(step(s, o)))
    val r = s.get // ops iterator is non-empty by mapGroupsWithState contract
    state.update(r)
    Materialized(key, r.tsMs, r.eventId, r.op, r.value, r.deleted)
  }

  /** Apply over a Dataset of ops (streaming: update mode). */
  def apply(ops: Dataset[CdcOp]): Dataset[Materialized] = {
    implicit val stateEnc = Encoders.product[RowState]
    implicit val outEnc = Encoders.product[Materialized]
    implicit val longEnc = Encoders.scalaLong
    ops.groupByKey(_.key)
      .mapGroupsWithState[RowState, Materialized](GroupStateTimeout.NoTimeout)(updateGroup)
  }

  /** The output mode this view requires when streamed. */
  val outputMode: OutputMode = OutputMode.Update()
}
