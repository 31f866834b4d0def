package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming observability: a `StreamingQueryListener` folding each query's
  * progress events into the running counters an operator actually pages on —
  * rows/s, batch duration, watermark lag, and ROWS DROPPED BY THE WATERMARK
  * (silent data loss if nobody watches it; the reference's stack pages on
  * the same signal via Spark UI + `ProcessingTimeExecutor` falling-behind
  * warnings, FLOW.md:107).
  *
  * Driver-side and O(#queries) state only — the listener sees already-
  * aggregated `QueryProgress` JSON, never rows. At scale this is the hook a
  * metrics bridge (StatsD/Prometheus) attaches to; here the counters land
  * in a TrieMap the tests (and `Serve`-style readers) can inspect.
  */
object Observability {

  /** Monotone per-query counters folded over all progress events. */
  final case class QueryStats(
      name: String,
      batches: Long,
      inputRows: Long,
      droppedByWatermark: Long,
      maxBatchDurationMs: Long,
      lastInputRowsPerSec: Double,
      stateRows: Long)

  final class Recorder extends StreamingQueryListener {
    val stats = new TrieMap[String, QueryStats]()

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryIdle(event: QueryIdleEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
      val state = p.stateOperators.map(_.numRowsTotal).sum
      val batchMs = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)
      val prev = stats.getOrElse(name,
        QueryStats(name, 0L, 0L, 0L, 0L, 0.0, 0L))
      stats.update(name, QueryStats(
        name,
        batches = prev.batches + 1,
        inputRows = prev.inputRows + p.numInputRows,
        droppedByWatermark = prev.droppedByWatermark + dropped,
        maxBatchDurationMs = math.max(prev.maxBatchDurationMs, batchMs),
        lastInputRowsPerSec =
          if (p.inputRowsPerSecond.isNaN) prev.lastInputRowsPerSec
          else p.inputRowsPerSecond,
        stateRows = state))
    }
  }

  /** Attach a fresh recorder to the session; caller keeps the handle. */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.streams.addListener(r)
    r
  }

  def detach(spark: SparkSession, r: Recorder): Unit =
    spark.streams.removeListener(r)
}
