package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Streaming first-K-per-key admission cap — the streaming counterpart of
  * the batch per-domain cap (`ops/Pipeline.domainCap`): while a capped
  * batch job re-ranks and keeps the BEST K per key, a stream must decide
  * at arrival time, so the streaming contract is "admit the first K
  * events per key, ever, across micro-batches" (the shape used for
  * per-domain crawl budgets, free-tier event quotas, or bounding any
  * downstream per-key fan-out).
  *
  * Built on `transformWithState`: per-key state is ONE long (admitted
  * count), read once and written at most once per key per micro-batch —
  * not per event. An optional state TTL turns the lifetime cap into a
  * rolling budget ("K per key per day") without any timer bookkeeping:
  * the count simply expires and admission reopens.
  *
  * Scale shape: state is 8 bytes × distinct keys (RocksDB-backed past
  * heap); each micro-batch touches only keys with arrivals; a hot key
  * costs one state read + the per-event counter walk, and its output is
  * bounded at K forever — the cap is itself the skew guard.
  */
object StreamCap {

  final case class Ev(key: String, payload: Long)
  final case class Admitted(key: String, payload: Long, admitIdx: Long)

  class Processor(k: Long) extends StatefulProcessor[String, Ev, Admitted] {
    @transient private var admitted: ValueState[Long] = _
    private var ttl: TTLConfig = TTLConfig.NONE

    def this(k: Long, ttl: TTLConfig) = { this(k); this.ttl = ttl }

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted", Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Admitted] = {
      var n = if (admitted.exists()) admitted.get() else 0L
      if (n >= k) return Iterator.empty // saturated: no state write either
      val out = Vector.newBuilder[Admitted]
      while (rows.hasNext && n < k) {
        val e = rows.next()
        n += 1
        out += Admitted(key, e.payload, n)
      }
      admitted.update(n)
      out.result().iterator
    }
  }

  /** Admit the first `k` events per key, across all micro-batches. */
  def firstKPerKey(events: Dataset[Ev], k: Long,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Admitted] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new Processor(k, ttl), TimeMode.None(),
        OutputMode.Append())
  }
}
