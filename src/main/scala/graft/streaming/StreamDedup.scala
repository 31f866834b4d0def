package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming near-duplicate SUPPRESSION: the arrival-time counterpart of
  * the batch MinHash pipeline (`ops/Dedup.minhashCandidates`). A batch
  * dedup job sees the whole corpus and picks cluster keepers; an ingest
  * stream must decide per document as it lands — "has something
  * near-identical already come through?" — which is the admission gate a
  * crawl/firehose pipeline puts in front of expensive downstream stages
  * (embedding, quality scoring, storage).
  *
  * Same sketch, different fold: each document's 12-element MinHash
  * signature over word 3-shingles is computed PER ROW with higher-order
  * functions (a streaming row IS one whole document, so the batch path's
  * explode → groupBy min — chosen there for whole-stage codegen over
  * billions of shingle rows — degenerates to a per-doc fold here; the
  * MATH is identical, pinned by a parity test against
  * `Dedup.minhashSignatures`). The 6×2 banded LSH keys are the batch
  * `Dedup.bands` construction verbatim; `transformWithState` keyed on
  * (band, key) holds up to [[StreamDedup.BucketCap]] signatures per
  * bucket and emits a [[StreamDedup.DupHit]] when an arrival matches a
  * stored signature in ≥ [[StreamDedup.MatchThreshold]]/12 positions.
  *
  * Scale shape: state is O(buckets × cap × 12 longs) in RocksDB, TTL
  * expires cold buckets (a near-dup of last month's page is usually fine
  * to re-admit); the bucket cap is the same mega-bucket skew guard as
  * batch `MaxBucketSize` — a boilerplate key stops absorbing signatures
  * at the cap instead of growing state without bound, trading recall on
  * degenerate buckets for a hard memory ceiling, exactly the batch
  * trade. A document appears in 6 buckets, so a duplicate may be
  * reported once per matching band; consumers that need at-most-one
  * flag per doc dedup on doc_id downstream (kept here so the emission
  * is pure per-key state, no cross-key coordination).
  */
object StreamDedup {

  /** Sketch geometry — MUST match `ops/Dedup`: 12 minhashes, 6 bands × 2. */
  val Signatures = 12
  val Bands = 6
  /** Matching signature positions (of 12) to call a near-dup: 10/12 ≈
    * Jaccard 0.83 estimate, the batch pipeline's review band. */
  val MatchThreshold = 10
  /** Signatures retained per LSH bucket (skew guard, see class doc). */
  val BucketCap = 16

  private val P = 999999937L

  final case class BandDoc(band_idx: Int, band_key: String, doc_id: Long,
      sig: Array[Long])
  final case class SigEntry(doc_id: Long, sig: Array[Long])
  final case class DupHit(doc_id: Long, dup_of: Long, matching: Int,
      band_idx: Int)

  /** Append the per-doc MinHash signature column (`sig`: 12 longs) to a
    * frame with `doc_id`/`text` — one md5 per shingle, the 12 hash
    * functions as linear transforms mod p, identical to the batch
    * construction (see `Dedup.minhashSignatures`). Docs under 3 tokens
    * have no 3-shingle and are passed through untouched by the batch
    * path; here they are dropped (no signature → nothing to dedup on). */
  def withSignature(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("hs", expr(
        s"""transform(sequence(0, size(toks) - 3),
           |  i -> cast(conv(substring(md5(concat_ws(' ',
           |         element_at(toks, i + 1), element_at(toks, i + 2),
           |         element_at(toks, i + 3))), 1, 15), 16, 10) as bigint) % $P)"""
          .stripMargin))
      .withColumn("sig", expr(
        s"""transform(sequence(0, ${Signatures - 1}),
           |  k -> array_min(transform(hs, h -> (h * (2 * k + 3) + k * 7919) % $P)))"""
          .stripMargin))
      .drop("toks", "hs")

  /** Explode a signed frame into (band_idx, band_key, doc_id, sig) rows —
    * the batch `Dedup.bands` key construction verbatim, with the full
    * signature riding along for the state comparison. */
  def bandRows(signed: DataFrame): Dataset[BandDoc] = {
    import signed.sparkSession.implicits._
    signed
      .select(col("doc_id"), col("sig"), posexplode(expr(
        """transform(sequence(0, 5),
          |  b -> md5(concat(cast(element_at(sig, 2 * b + 1) as string), ',',
          |                  cast(element_at(sig, 2 * b + 2) as string))))"""
          .stripMargin)))
      .select(col("pos").cast("int").as("band_idx"), col("col").as("band_key"),
        col("doc_id"), col("sig"))
      .as[BandDoc]
  }

  class Processor(ttl: TTLConfig) extends StatefulProcessor[String, BandDoc, DupHit] {
    @transient private var seen: ListState[SigEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[SigEntry]("seen", Encoders.product[SigEntry], ttl)

    private def matching(a: Array[Long], b: Array[Long]): Int = {
      var i = 0; var n = 0
      while (i < a.length && i < b.length) { if (a(i) == b(i)) n += 1; i += 1 }
      n
    }

    override def handleInputRows(key: String, rows: Iterator[BandDoc],
        tv: TimerValues): Iterator[DupHit] = {
      // One state read per key per micro-batch; arrivals within the batch
      // compare against (and join) the same in-memory working set.
      val held = scala.collection.mutable.ArrayBuffer.empty[SigEntry]
      if (seen.exists()) seen.get().foreach(held += _)
      val out = Vector.newBuilder[DupHit]
      var appended = false
      rows.foreach { d =>
        val hit = held.iterator
          .map(e => e -> matching(e.sig, d.sig))
          .find(_._2 >= MatchThreshold)
        hit match {
          case Some((e, m)) => out += DupHit(d.doc_id, e.doc_id, m, d.band_idx)
          case None =>
            if (held.length < BucketCap) {
              held += SigEntry(d.doc_id, d.sig)
              appended = true
            } // at cap: degenerate bucket stops absorbing (skew guard)
        }
      }
      if (appended) seen.put(held.toArray)
      out.result().iterator
    }
  }

  /** The full streaming operator: docs (`doc_id`, `text`) → append-mode
    * [[DupHit]]s as arrivals match remembered signatures. Works on a batch
    * frame too (Spark runs transformWithState in batch mode with empty
    * initial state), which is how the spec cross-checks it. */
  def nearDupHits(docs: DataFrame, ttl: TTLConfig = TTLConfig.NONE): Dataset[DupHit] = {
    import docs.sparkSession.implicits._
    bandRows(withSignature(docs))
      .groupByKey(b => s"${b.band_idx}:${b.band_key}")
      .transformWithState(new Processor(ttl), TimeMode.None(), OutputMode.Append())
  }
}
