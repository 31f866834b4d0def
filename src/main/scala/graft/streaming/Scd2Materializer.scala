package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues}

import graft.streaming.CdcMaterializer.CdcOp

/** Streaming TYPE-2 history maintenance — the incremental counterpart of
  * the batch [[graft.sources.Cdc.scd2History]] (which needs the whole op
  * log and a per-key `lead` window): as ops arrive, each key's CURRENT
  * version lives in typed `ValueState`; an update emits the old version
  * CLOSED (`valid_to` = the new op's ts, `is_current = false`) plus the
  * new version OPEN, and a delete emits just the close. Downstream is the
  * standard upsert sink keyed by (key, version_n) — an open row is later
  * overwritten by its own closed form, exactly how a warehouse maintains
  * SCD2 without rebuilding history.
  *
  * The version counter outlives deletes (state keeps `versions` even when
  * no row is live), so re-inserted keys continue numbering where the batch
  * rebuild's `row_number` over all non-delete ops would — Scd2Spec pins
  * the reconciliation: replaying the emissions and keeping the last write
  * per (key, version) EQUALS the batch `scd2History` over the same log.
  * Stale ops (not strictly newer than the current version by (ts, offset))
  * are ignored, same contract as [[CdcMaterializer.step]].
  *
  * Scale: state is one small row per key ever seen (versions counter) —
  * the same cardinality the snapshot materializer carries — partitioned by
  * key on the RocksDB state store.
  */
object Scd2Materializer {

  /** One emitted history row; an open version has `validToMs = None`. */
  final case class Scd2Row(key: Long, versionN: Long, eventId: Long,
      value: Double, validFromMs: Long, validToMs: Option[Long],
      isCurrent: Boolean)

  /** Per-key state: how many versions ever opened, the current one, and
    * the last APPLIED op position (lastTs/lastEvent) — kept separately
    * from the current version so an op arriving after a delete but
    * positioned before it is still recognized as stale (a delete leaves
    * no current version to compare against). */
  final case class Scd2State(versions: Long, hasCur: Boolean,
      curTs: Long, curEvent: Long, curValue: Double,
      lastTs: Long, lastEvent: Long)

  class Processor extends StatefulProcessor[Long, CdcOp, Scd2Row] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Scd2State] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Scd2State]("scd2",
        Encoders.product[Scd2State], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CdcOp],
        timers: TimerValues): Iterator[Scd2Row] = {
      var s = if (state.exists()) state.get()
        else Scd2State(0L, hasCur = false, 0L, 0L, 0.0, -1L, -1L)
      val out = Vector.newBuilder[Scd2Row]
      rows.toSeq.sortBy(o => (o.tsMs, o.eventId)).foreach { op =>
        val stale = op.tsMs < s.lastTs ||
          (op.tsMs == s.lastTs && op.eventId <= s.lastEvent)
        if (!stale) {
          if (s.hasCur) // close the standing version at the new op's ts
            out += Scd2Row(key, s.versions, s.curEvent, s.curValue,
              s.curTs, Some(op.tsMs), isCurrent = false)
          if (op.deleted) {
            // Deletes consume a version number without emitting a row —
            // matching the batch rebuild's row_number over the FULL op
            // log, where the gap in version_n marks the deletion.
            s = s.copy(versions = s.versions + 1, hasCur = false,
              lastTs = op.tsMs, lastEvent = op.eventId)
          } else {
            s = Scd2State(s.versions + 1, hasCur = true,
              op.tsMs, op.eventId, op.value, op.tsMs, op.eventId)
            out += Scd2Row(key, s.versions, op.eventId, op.value,
              op.tsMs, None, isCurrent = true)
          }
        }
      }
      state.update(s)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Scd2Row] = Iterator.empty
  }

  def apply(ops: Dataset[CdcOp]): Dataset[Scd2Row] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Scd2Row]
    ops.groupByKey(_.key)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update(),
        Encoders.product[Scd2Row])
  }
}
