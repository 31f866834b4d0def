package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Chunked bitmap over non-negative integer ids: sorted chunk indices
  * (id >> 12), each chunk a flat block of 64 words (4096 ids). `words`
  * is `chunks.length * 64` longs — two primitive array columns in the
  * aggregation buffer, no per-element boxing.
  */
case class BM(chunks: Seq[Long], words: Seq[Long])

/** Mergeable EXACT distinct counting over integer keys — the bitmap
  * answer to the caveat stated at [[graft.ops.Incremental]] and
  * [[graft.ops.Frames.hllRollup]]: plain count-distinct is not mergeable,
  * HLL is mergeable but approximate; a bitmap per fine grain ORs to any
  * coarse grain with EXACT cardinality and no fact rescans.
  *
  * The registered rollup builds per-(week, day) user bitmaps, ORs them to
  * weeks, and reads exact distinct counts off the merged bitmaps; the
  * DuckDB oracle computes `count(DISTINCT user_id)` per week directly —
  * the hash match proves OR-merge == one-shot distinct, which is the
  * property a lakehouse relies on when it stores day-grain bitmap columns
  * (the Roaring pattern: Chambi et al., "Better bitmap performance with
  * Roaring bitmaps").
  *
  * Scale notes: state is O(distinct ids / 8) bytes worst-case per grain —
  * for 10⁹ sparse ids a production build swaps this chunk layout for
  * RoaringBitmap containers (array/run/bitmap per chunk; same merge
  * algebra, not in this container's dependency set) behind the same
  * Aggregator surface. Per-row accumulation mutates a [[Bitmaps.BMBuf]]
  * in place (O(1) per id); the immutable [[BM]] exists only at finish and
  * as the column value — so dense groups cost O(rows + state), not
  * O(rows × state).
  */
object Bitmaps {

  private val ChunkBits = 12
  private val WordsPerChunk = 1 << (ChunkBits - 6) // 64 words = 4096 ids

  private[graft] def or(a: BM, b: BM): BM = {
    if (a.chunks.isEmpty) return b
    if (b.chunks.isEmpty) return a
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Long]
    val words = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0; var j = 0
    while (i < a.chunks.length || j < b.chunks.length) {
      val takeA = j >= b.chunks.length ||
        (i < a.chunks.length && a.chunks(i) <= b.chunks(j))
      val takeB = i >= a.chunks.length ||
        (j < b.chunks.length && b.chunks(j) <= a.chunks(i))
      val c = if (takeA) a.chunks(i) else b.chunks(j)
      chunks += c
      var w = 0
      while (w < WordsPerChunk) {
        val wa = if (takeA) a.words(i * WordsPerChunk + w) else 0L
        val wb = if (takeB) b.words(j * WordsPerChunk + w) else 0L
        words += (wa | wb)
        w += 1
      }
      if (takeA) i += 1
      if (takeB) j += 1
    }
    BM(chunks.toIndexedSeq, words.toIndexedSeq)
  }

  private[graft] def set(id: Long): BM = {
    require(id >= 0, s"bitmap ids must be non-negative, got $id")
    val chunk = id >> ChunkBits
    val offset = (id & ((1 << ChunkBits) - 1)).toInt
    val words = new Array[Long](WordsPerChunk)
    words(offset >> 6) = 1L << (offset & 63)
    BM(Vector(chunk), words.toIndexedSeq)
  }

  private[graft] def cardinality(b: BM): Long =
    b.words.foldLeft(0L)((acc, w) => acc + java.lang.Long.bitCount(w))

  /** Mutable accumulation buffer for [[BitmapAgg]]: chunk index → 64-word
    * block, bit-set IN PLACE per input row — O(1) amortized per id, no
    * allocation beyond first touch of a chunk. The immutable sorted [[BM]]
    * is materialized only at the finish boundary; `merge` ORs block-wise
    * into `this`. Kryo-encoded: the buffer crosses the wire only at the
    * partial→final shuffle (one blob per group, never per row), where the
    * java.util.HashMap payload serializes via Kryo's built-in map support.
    */
  final class BMBuf(val blocks: java.util.HashMap[java.lang.Long, Array[Long]])
      extends Serializable {
    def this() = this(new java.util.HashMap[java.lang.Long, Array[Long]]())

    def add(id: Long): BMBuf = {
      require(id >= 0, s"bitmap ids must be non-negative, got $id")
      val chunk = java.lang.Long.valueOf(id >> ChunkBits)
      val offset = (id & ((1 << ChunkBits) - 1)).toInt
      var w = blocks.get(chunk)
      if (w == null) { w = new Array[Long](WordsPerChunk); blocks.put(chunk, w) }
      w(offset >> 6) |= 1L << (offset & 63)
      this
    }

    def orInPlace(other: BMBuf): BMBuf = {
      other.blocks.forEach { (chunk, ow) =>
        val w = blocks.get(chunk)
        if (w == null) blocks.put(chunk, ow.clone())
        else { var i = 0; while (i < WordsPerChunk) { w(i) |= ow(i); i += 1 } }
      }
      this
    }

    /** Sorted-chunk immutable form — identical to folding [[Bitmaps.or]]
      * over single-id bitmaps (pinned in PureProps). */
    def toBM: BM = {
      val chunkIds = blocks.keySet().toArray(new Array[java.lang.Long](0))
        .map(_.longValue()).sorted
      val words = new Array[Long](chunkIds.length * WordsPerChunk)
      var i = 0
      while (i < chunkIds.length) {
        System.arraycopy(blocks.get(chunkIds(i)), 0, words, i * WordsPerChunk,
          WordsPerChunk)
        i += 1
      }
      BM(chunkIds.toIndexedSeq, words.toIndexedSeq)
    }
  }

  class BitmapAgg extends Aggregator[Long, BMBuf, BM] {
    def zero: BMBuf = new BMBuf()
    def reduce(b: BMBuf, id: Long): BMBuf = b.add(id)
    def merge(x: BMBuf, y: BMBuf): BMBuf = x.orInPlace(y)
    def finish(r: BMBuf): BM = r.toBM
    def bufferEncoder = Encoders.kryo[BMBuf]
    def outputEncoder = Encoders.product[BM]
  }

  class MergeBitmaps extends Aggregator[BM, BM, BM] {
    def zero: BM = BM(Vector.empty, Vector.empty)
    def reduce(b: BM, a: BM): BM =
      if (a == null || a.chunks == null) b else or(b, a)
    def merge(x: BM, y: BM): BM = or(x, y)
    def finish(r: BM): BM = r
    def bufferEncoder = Encoders.product[BM]
    def outputEncoder = Encoders.product[BM]
  }

  def bitmapAgg = udaf(new BitmapAgg, Encoders.scalaLong)
  def mergeBitmaps = udaf(new MergeBitmaps, Encoders.product[BM])

  /** Day→week exact-distinct rollup: the fact table is scanned once at
    * day grain; the week grain only ORs day bitmaps. */
  def bitmapDistinctRollup(events: DataFrame): DataFrame = {
    val daily = events
      .select(date_trunc("week", col("ts")).as("week"),
        date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("week"), col("day"))
      .agg(bitmapAgg(col("user_id")).as("bm"))
    daily.groupBy(col("week"))
      .agg(count(lit(1)).as("n_days"),
        mergeBitmaps(col("bm.chunks"), col("bm.words")).as("bm"))
      .select(unix_micros(col("week")).as("week_us"), col("n_days"),
        expr("aggregate(bm.words, 0L, (a, w) -> a + bit_count(w))")
          .as("distinct_users"))
      .orderBy(col("week_us"))
  }

  /** Pairwise exact audience overlap across event types — the bitmap AND
    * dual of [[bitmapDistinctRollup]]'s OR: per-type user bitmaps are built
    * in ONE fact scan, then every type pair's intersection cardinality is
    * read off the bitmaps — where the naive form self-joins the distinct
    * (type, user) table, rescanning/reshuffling user-grain rows per pair.
    * The DuckDB oracle IS that naive self-join, so the hash match proves
    * bitmap-AND == exact set intersection.
    *
    * Scale shape: the bitmaps never travel whole — they are posexploded to
    * (type, chunk, slot, word) rows (zero words dropped), and the pair
    * intersection is an equi-join on (chunk, slot): per join key there are
    * at most T rows per side (T = #types), so fan-out is bounded by T² per
    * word regardless of user count; `bit_count(wa & wb)` then sums 64 users
    * per codegen'd row. Driver sees only the T·(T−1)/2 result rows.
    */
  def bitmapOverlap(events: DataFrame): DataFrame = {
    val perType = events.groupBy(col("event_type"))
      .agg(bitmapAgg(col("user_id")).as("bm"))
    val words = perType
      .select(col("event_type"), col("bm.chunks").as("chunks"),
        posexplode(col("bm.words")).as(Seq("wi", "w")))
      .filter(col("w") =!= 0L)
      .select(col("event_type"),
        expr(s"element_at(chunks, cast((wi div $WordsPerChunk) + 1 as int))").as("chunk"),
        (col("wi") % WordsPerChunk).as("slot"), col("w"))
    val inter = words.as("a").join(words.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.slot") === col("b.slot") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(sum(expr("bit_count(a.w & b.w)")).cast("long").as("n_common"))
    val totals = perType.select(col("event_type"),
      expr("aggregate(bm.words, 0L, (acc, w) -> acc + bit_count(w))").as("n"))
    totals.as("ta").join(totals.as("tb"),
        col("ta.event_type") < col("tb.event_type"))
      .join(inter,
        col("ta.event_type") === col("type_a") && col("tb.event_type") === col("type_b"),
        "left")
      .select(col("ta.event_type").as("type_a"), col("tb.event_type").as("type_b"),
        col("ta.n").as("n_a"), col("tb.n").as("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_both"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Rolling 7-day exact distinct users per day — the metric COUNT
    * DISTINCT OVER a sliding frame cannot express (distinct doesn't
    * decompose over window frames; engines reject it). Bitmaps restore
    * decomposability: ONE fact scan builds a bitmap per day, each day's
    * bitmap is replicated to the ≤7 window ends it contributes to
    * (day-grain rows, not fact rows), and the per-end OR-merge reads the
    * exact cardinality. At 100 TB the fact table still shuffles once on
    * day grain; everything after is O(days × 7) bitmap traffic. The
    * DuckDB oracle recomputes each day's window from raw events — hash
    * equality proves replicate-and-OR == per-window distinct.
    */
  def rollingDistinctUsers(events: DataFrame): DataFrame = {
    // Single-consumer plan: each day's bitmap is exploded to the ≤7 window
    // ends it contributes to with an `is_own` flag, and ONE day-grain
    // aggregation computes both the own-day cardinality (max over the
    // single flagged contribution) and the 7-day OR-merge. Days the corpus
    // lacks produce no flagged row, so the isNotNull filter drops the
    // phantom tail past max(day) and silent-gap days — the former
    // present-spine join. One fact shuffle + one day-grain shuffle, no
    // persist: the earlier cached two-consumer form recorded
    // nondeterministic shuffle bytes (consumers raced the lazy cache
    // materialization), which silently disabled the bench contention
    // guard's unchanged-shuffle escape for this query.
    events
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(bitmapAgg(col("user_id")).as("bm"))
      .withColumn("target_day",
        explode(expr("sequence(day, day + interval 6 days, interval 1 day)")))
      .groupBy(col("target_day"))
      .agg(
        max(when(col("target_day") === col("day"),
          expr("aggregate(bm.words, 0L, (a, w) -> a + bit_count(w))")))
          .as("n_users_1d"),
        mergeBitmaps(col("bm.chunks"), col("bm.words")).as("bm7"))
      .where(col("n_users_1d").isNotNull)
      .select(unix_micros(col("target_day")).as("day_us"), col("n_users_1d"),
        expr("aggregate(bm7.words, 0L, (a, w) -> a + bit_count(w))").as("n_users_7d"))
      .orderBy(col("day_us"))
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bitmap_distinct_rollup" -> ((s, d) => bitmapDistinctRollup(Tables.events(s, d))),
    "bitmap_overlap" -> ((s, d) => bitmapOverlap(Tables.events(s, d))),
    "rolling_distinct_users" -> ((s, d) => rollingDistinctUsers(Tables.events(s, d))),
  )

  /** The oracle recomputes the distinct counts in ONE shot per week —
    * equality proves the bitmap OR-merge is exact. */
  def oracleSql: Map[String, String] = Map(
    "bitmap_distinct_rollup" ->
      """SELECT epoch_us(date_trunc('week', ts)) AS week_us,
        |  count(DISTINCT date_trunc('day', ts)) AS n_days,
        |  count(DISTINCT user_id) AS distinct_users
        |FROM events
        |GROUP BY date_trunc('week', ts)
        |ORDER BY week_us""".stripMargin,
    // The oracle is the naive pairwise self-join the bitmap plan avoids —
    // equality proves bitmap-AND == exact intersection.
    "bitmap_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |t AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
        |ov AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
        |  FROM tu a JOIN tu b USING (user_id)
        |  WHERE a.event_type < b.event_type GROUP BY 1, 2
        |)
        |SELECT ta.event_type AS type_a, tb.event_type AS type_b,
        |  ta.n AS n_a, tb.n AS n_b, coalesce(ov.n_both, 0)::BIGINT AS n_both
        |FROM t ta JOIN t tb ON ta.event_type < tb.event_type
        |LEFT JOIN ov ON ov.type_a = ta.event_type AND ov.type_b = tb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    // Each window recomputed from raw events — equality proves the
    // replicate-and-OR plan is the exact sliding distinct.
    "rolling_distinct_users" ->
      """WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)
        |SELECT epoch_us(d.day) AS day_us,
        |  (SELECT count(DISTINCT user_id) FROM events e
        |   WHERE date_trunc('day', e.ts) = d.day) AS n_users_1d,
        |  (SELECT count(DISTINCT user_id) FROM events e
        |   WHERE date_trunc('day', e.ts) BETWEEN d.day - INTERVAL 6 DAY AND d.day)
        |    AS n_users_7d
        |FROM days d ORDER BY day_us""".stripMargin,
  )
}
