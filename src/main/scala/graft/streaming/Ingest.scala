package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The streaming LLM-ingest path as ONE query: per-source admission cap →
  * MinHash near-dup suppression → token packing, three chained
  * `transformWithState` operators. [[StreamCap]] and [[StreamDedup]] prove
  * the stages in isolation; this object proves they COMPOSE — a crawl
  * firehose in, shard-assigned training documents out, with all state
  * (admission counters, signature memory, shard fill levels) advancing
  * together micro-batch by micro-batch.
  *
  * Stage contracts:
  *   - cap: admit the first `k` docs per source, ever (crawl budget);
  *   - dedup: suppress a doc whose signature matches ≥ 10/12 positions of
  *     a REMEMBERED doc in its LSH bucket (same signature family as the
  *     batch `ops/Dedup`, single-band keying so each doc has exactly one
  *     pass/suppress decision — the composition-friendly geometry; the
  *     6-band high-recall form stays in [[StreamDedup]]);
  *   - pack: greedy first-fit-in-arrival-order shard assignment per
  *     source, `transformWithState` carrying (shard, fill) per key — the
  *     streaming rendition of `ops/Pipeline.tokenPacking`'s running-total
  *     windows.
  *
  * Scale shape: stage states are O(sources) + O(buckets × cap) + O(sources)
  * — all key-partitioned, RocksDB-backed past heap; no stage ever holds a
  * corpus. The bucket cap is the skew guard exactly as in [[StreamDedup]].
  */
object Ingest {

  final case class Doc(doc_id: Long, source: String, text: String)
  final case class SignedDoc(doc_id: Long, source: String, n_tokens: Long,
      bucket: String, sig: Array[Long])
  final case class Deduped(doc_id: Long, source: String, n_tokens: Long)
  final case class Packed(doc_id: Long, source: String, shard: Long,
      offset_tokens: Long, n_tokens: Long)
  final case class ShardFill(shard: Long, filled: Long)

  /** Matching positions (of 12) to suppress; the [[StreamDedup]] band. */
  val MatchThreshold: Int = StreamDedup.MatchThreshold
  /** Signatures remembered per bucket (degenerate-bucket skew guard). */
  val BucketCap: Int = StreamDedup.BucketCap

  /** Stage 1: first-k-per-source admission, text carried through
    * (the [[StreamCap]] counter contract over a wider payload). */
  class CapProcessor(k: Long) extends StatefulProcessor[String, Doc, Doc] {
    @transient private var admitted: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Doc],
        tv: TimerValues): Iterator[Doc] = {
      var n = if (admitted.exists()) admitted.get() else 0L
      if (n >= k) return Iterator.empty
      val out = Vector.newBuilder[Doc]
      while (rows.hasNext && n < k) { out += rows.next(); n += 1 }
      admitted.update(n)
      out.result().iterator
    }
  }

  /** Stage 2: near-dup suppression with PASS-THROUGH semantics — emit the
    * doc when nothing in its bucket's remembered signatures matches, else
    * emit nothing (the suppressed doc simply vanishes from the stream). */
  class DedupPassProcessor
      extends StatefulProcessor[String, SignedDoc, Deduped] {
    @transient private var seen: ListState[StreamDedup.SigEntry] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[StreamDedup.SigEntry]("seen",
        Encoders.product[StreamDedup.SigEntry], TTLConfig.NONE)
    private def matching(a: Array[Long], b: Array[Long]): Int = {
      var i = 0; var n = 0
      while (i < a.length && i < b.length) { if (a(i) == b(i)) n += 1; i += 1 }
      n
    }
    override def handleInputRows(key: String, rows: Iterator[SignedDoc],
        tv: TimerValues): Iterator[Deduped] = {
      val held = scala.collection.mutable.ArrayBuffer.empty[StreamDedup.SigEntry]
      if (seen.exists()) seen.get().foreach(held += _)
      val out = Vector.newBuilder[Deduped]
      var appended = false
      rows.foreach { d =>
        val dup = held.exists(e => matching(e.sig, d.sig) >= MatchThreshold)
        if (!dup) {
          out += Deduped(d.doc_id, d.source, d.n_tokens)
          if (held.length < BucketCap) {
            held += StreamDedup.SigEntry(d.doc_id, d.sig)
            appended = true
          }
        }
      }
      if (appended) seen.put(held.toArray)
      out.result().iterator
    }
  }

  /** Stage 3: greedy shard packing per source — first fit in arrival
    * order, one (shard, fill) state per key. A doc longer than the shard
    * budget gets a shard of its own (same oversize rule as the batch
    * packer). */
  class PackProcessor(shardTokens: Long)
      extends StatefulProcessor[String, Deduped, Packed] {
    @transient private var fill: ValueState[ShardFill] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      fill = getHandle.getValueState[ShardFill]("fill",
        Encoders.product[ShardFill], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Deduped],
        tv: TimerValues): Iterator[Packed] = {
      var cur = if (fill.exists()) fill.get() else ShardFill(0L, 0L)
      val out = Vector.newBuilder[Packed]
      rows.foreach { d =>
        if (cur.filled > 0 && cur.filled + d.n_tokens > shardTokens)
          cur = ShardFill(cur.shard + 1, 0L)
        out += Packed(d.doc_id, d.source, cur.shard, cur.filled, d.n_tokens)
        cur = ShardFill(cur.shard, cur.filled + d.n_tokens)
      }
      fill.update(cur)
      out.result().iterator
    }
  }

  /** Signature + single-band bucket key + token count, batch-identical
    * MinHash construction (delegates to [[StreamDedup.withSignature]]). */
  def signed(docs: DataFrame): Dataset[SignedDoc] = {
    import docs.sparkSession.implicits._
    StreamDedup.withSignature(docs)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        expr("""md5(concat(cast(element_at(sig, 1) as string), ',',
                           cast(element_at(sig, 2) as string)))""").as("bucket"),
        col("sig"))
      .as[SignedDoc]
  }

  /** The composed single-query pipeline: cap → dedup → pack. */
  def pipeline(docs: Dataset[Doc], k: Long, shardTokens: Long): Dataset[Packed] = {
    import docs.sparkSession.implicits._
    val capped = docs.groupByKey(_.source)
      .transformWithState(new CapProcessor(k), TimeMode.None(), OutputMode.Append())
    val deduped = signed(capped.toDF())
      .groupByKey(_.bucket)
      .transformWithState(new DedupPassProcessor, TimeMode.None(), OutputMode.Append())
    deduped.groupByKey(_.source)
      .transformWithState(new PackProcessor(shardTokens), TimeMode.None(),
        OutputMode.Append())
  }
}
