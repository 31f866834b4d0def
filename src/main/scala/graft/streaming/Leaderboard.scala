package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Continuous top-k leaderboard on `transformWithState` — the streaming
  * analog of the batch [[graft.plans.TopK]] operator: every micro-batch,
  * each group that received score deltas re-emits its current top-k
  * standings.
  *
  * Why the state is a MAP of running totals and not a bounded top-k list:
  * exact top-k over accumulating DELTAS is not boundable — a member
  * outside today's top-k can accumulate into tomorrow's, so forgetting it
  * would under-rank (the same reason exact count-distinct is not
  * mergeable). The per-group member map is the honest minimal state;
  * `MapState` keeps it point-readable (one RocksDB read per arriving
  * delta, never a full-map deserialize — the win over a `ValueState[Map]`
  * at scale) and the full-map scan happens only for groups with arrivals
  * in the batch, at O(members-per-group) — bounded by the domain (courses
  * per region, SKUs per store), not by the stream.
  *
  * For a truly OPEN member domain (anonymous visitor ids, session keys)
  * the map itself grows with the stream, so the processor offers two
  * opt-in eviction modes that trade exactness for bounded state:
  *   - `minTotal`: a member whose running total is still below the
  *     threshold after a batch's arrivals is dropped; if it returns, it
  *     restarts from zero. Standings tolerance: every reported total is a
  *     LOWER bound on the true total, under-counted by strictly less than
  *     `minTotal` per eviction episode — so any member whose true total
  *     clears `k-th place + minTotal` is guaranteed to appear, and members
  *     already at or above the threshold are never perturbed.
  *   - `ttl`: a state-store [[TTLConfig]] so members idle past the TTL age
  *     out (requires processing-time mode; deployment knob — the
  *     deterministic spec coverage is the minTotal mode).
  *
  * Scale shape: keyed by group → uniformly hashed across executors; a
  * micro-batch touches only arriving groups; RocksDB holds the long tail
  * out of heap. The top-k scan itself is the partial-heap trick from the
  * batch operator (O(members·log k), no sort).
  */
object Leaderboard {

  final case class Score(group: String, member: String, delta: Double)
  final case class Standing(group: String, rank: Int, member: String, total: Double)

  class Processor(k: Int, minTotal: Option[Double] = None,
      ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, Score, Standing] {
    @transient private var totals: MapState[String, Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getMapState[String, Double]("totals",
        Encoders.STRING, Encoders.scalaDouble, ttl)

    override def handleInputRows(key: String, rows: Iterator[Score],
        tv: TimerValues): Iterator[Standing] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { s =>
        val cur = if (totals.containsKey(s.member)) totals.getValue(s.member) else 0.0
        totals.updateValue(s.member, cur + s.delta)
        touched += s.member
      }
      // minTotal eviction: checked only for members touched this batch —
      // O(arrivals), never a full-map sweep. Invariant: state holds only
      // members whose total cleared the threshold at their last arrival,
      // so untouched dust was already evicted when it last arrived.
      minTotal.foreach { t =>
        touched.foreach { m =>
          if (totals.containsKey(m) && totals.getValue(m) < t) totals.removeKey(m)
        }
      }
      // Bounded heap over the group's members — k log k ordering at the
      // end, never a full sort. Ties break by member name for determinism.
      val ord = Ordering.by[(String, Double), (Double, String)] {
        case (m, t) => (-t, m)
      }
      val heap = scala.collection.mutable.PriorityQueue.empty[(String, Double)](ord)
      totals.iterator().foreach { case (m, t) =>
        heap.enqueue((m, t))
        if (heap.size > k) heap.dequeue()
      }
      val ordered: Seq[(String, Double)] = heap.dequeueAll.reverse
      ordered.iterator.zipWithIndex.map {
        case ((m, t), i) => Standing(key, i + 1, m, t)
      }
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Standing] = Iterator.empty
  }

  /** Per-batch standings of `scores` (update mode; no event-time needed —
    * the leaderboard is order-insensitive in its deltas). `minTotal` opts
    * into below-threshold eviction for open member domains (see class doc
    * for the standings tolerance it buys bounded state with). */
  def apply(scores: Dataset[Score], k: Int = 3,
      minTotal: Option[Double] = None): Dataset[Standing] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[Standing]
    scores.groupByKey(_.group)
      .transformWithState(new Processor(k, minTotal), TimeMode.None(),
        OutputMode.Update(), Encoders.product[Standing])
  }
}
