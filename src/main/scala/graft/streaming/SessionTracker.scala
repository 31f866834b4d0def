package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Gap-based sessionization on the `transformWithState` arbitrary-state API
  * (Spark 4.x's successor to `mapGroupsWithState`), demonstrating the two
  * capabilities the older API lacks and this codebase otherwise works
  * around: EVENT-TIME TIMERS (a session closes when the watermark passes
  * its idle deadline — no sentinel events, no per-batch full-state sweep)
  * and typed, independently-evolvable state variables with optional TTL.
  *
  * Semantics match `ops/Temporal.userSessions` (native `session_window`,
  * 30-min default gap); this form exists for pipelines that need custom
  * per-session logic the declarative operator can't express (e.g. emitting
  * only sessions above a spend floor, or side outputs per event). Runs on
  * the RocksDB state store provider, which `transformWithState` requires —
  * also the right provider at scale (state larger than executor heap,
  * incremental changelog checkpointing).
  *
  * Scale shape: state is O(open sessions), keyed by user — uniformly
  * distributed, no hot key; each micro-batch touches only keys with
  * arrivals plus keys whose timers fire. Stale timers are tolerated by
  * re-checking the deadline at expiry instead of `deleteTimer`
  * bookkeeping (one state read vs a timer-store write per event).
  */
object SessionTracker {

  final case class Ev(userId: Long, ts: Timestamp, amount: Double)
  final case class SessState(startMs: Long, endMs: Long, nEvents: Long, total: Double)
  final case class Session(userId: Long, startMs: Long, endMs: Long,
      nEvents: Long, total: Double)

  val DefaultGapMs: Long = 30L * 60 * 1000

  class Processor(gapMs: Long) extends StatefulProcessor[Long, Ev, Session] {
    @transient private var sess: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessState]("sess",
        Encoders.product[SessState], TTLConfig.NONE)

    private def close(key: Long, s: SessState): Session =
      Session(key, s.startMs, s.endMs, s.nEvents, s.total)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Session] = {
      // Micro-batch arrival order is not event-time order; fold sorted.
      val sorted = rows.toIndexedSeq.sortBy(_.ts.getTime)
      var out = Vector.empty[Session]
      var cur = if (sess.exists()) Option(sess.get()) else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.endMs > gapMs =>
            // Gap crossed within the batch: the old session is complete
            // no matter what the watermark says — emit it now.
            out :+= close(key, s)
            cur = Some(SessState(t, t, 1, e.amount))
          case Some(s) =>
            cur = Some(SessState(s.startMs, math.max(s.endMs, t),
              s.nEvents + 1, s.total + e.amount))
          case None =>
            cur = Some(SessState(t, t, 1, e.amount))
        }
      }
      cur.foreach { s =>
        sess.update(s)
        // Idle deadline; superseded timers are filtered at expiry.
        getHandle.registerTimer(s.endMs + gapMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] = {
      if (!sess.exists()) return Iterator.empty
      val s = sess.get()
      if (info.getExpiryTimeInMs >= s.endMs + gapMs) {
        sess.clear()
        Iterator.single(close(key, s))
      } else Iterator.empty // stale timer: the session saw newer events
    }
  }

  /** Completed sessions of `events` (append mode, event-time timers).
    * Callers must set a watermark on `ts` — the timers advance with it. */
  def apply(events: Dataset[Ev], gapMs: Long = DefaultGapMs): Dataset[Session] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Session]
    events.groupByKey(_.userId)
      .transformWithState(new Processor(gapMs), TimeMode.EventTime(),
        OutputMode.Append(), Encoders.product[Session])
  }
}
