package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Input row of the bottom-k sketch: a 60-bit priority hash + the value. */
case class HV(h: Long, v: Double)

/** The sketch itself: parallel arrays sorted by (h, v), at most k entries.
  * Kept as two primitive-friendly Seqs (not Seq[HV]) so the Spark buffer
  * encoding is two ArrayType columns — no per-element struct boxing in the
  * aggregation buffer.
  */
case class Sketch(hs: Seq[Long], vs: Seq[Double])

/** KMV distinct sketch: the k minimum DISTINCT hash values, sorted. */
case class KmvSk(hs: Seq[Long])

/** Mergeable bottom-k sample sketch as a typed [[Aggregator]] — the UDAF
  * rung of the custom-function ladder (the repo's other rungs: native
  * codegen Expression `vec_dot`, optimizer rule, whole-operator planner
  * strategy `TopK`).
  *
  * The sketch keeps the k rows with the smallest md5-derived priority hash.
  * Because "bottom-k of a union = merge of bottom-k's" exactly, sketches
  * built per fine grain (day) can be unioned to any coarser grain (week,
  * month) WITHOUT rescanning the fact table — the same rollup contract as
  * the HLL sketches in `Frames.hllRollup`, but yielding a uniform sample,
  * hence mergeable QUANTILES (and any other statistic of a sample).
  * Everything is deterministic — the priority is a hash, not an RNG — so
  * the two-level Spark rollup hash-matches a one-shot DuckDB oracle that
  * simply takes the bottom-k per coarse group directly: the equality
  * oracle-checks the merge property itself.
  *
  * Scale shape: per-grain state is O(k); map-side partial aggregation does
  * the sampling before any shuffle, so each day's shuffle traffic is one
  * ≤k-entry sketch regardless of fact size. At 100 TB the daily sketch
  * table is tiny and any rollup over it is driver-cheap.
  */
object Sketches {

  /** Sample size. 64 keeps worst-case quantile rank error ~±12% at 95%
    * confidence — the profile-grade accuracy this query documents; raise k
    * for tighter bounds (state is O(k), so even k=4096 is nothing).
    */
  val K = 64

  /** Two-pointer merge of two (h, v)-sorted sketches, truncated to k.
    * Associative and commutative under the total order (h, v) — partial
    * aggregation may combine buffers in any grouping/order and converge to
    * the same sketch.
    */
  private[graft] def mergeSketch(a: Sketch, b: Sketch, k: Int): Sketch = {
    val n = math.min(k, a.hs.length + b.hs.length)
    val hs = new Array[Long](n)
    val vs = new Array[Double](n)
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      val takeA =
        if (i >= a.hs.length) false
        else if (j >= b.hs.length) true
        else a.hs(i) < b.hs(j) || (a.hs(i) == b.hs(j) && a.vs(i) <= b.vs(j))
      if (takeA) { hs(o) = a.hs(i); vs(o) = a.vs(i); i += 1 }
      else { hs(o) = b.hs(j); vs(o) = b.vs(j); j += 1 }
      o += 1
    }
    Sketch(hs.toIndexedSeq, vs.toIndexedSeq)
  }

  /** Build a bottom-k sketch from (hash, value) rows. */
  class BottomK(k: Int) extends Aggregator[HV, Sketch, Sketch] {
    def zero: Sketch = Sketch(Vector.empty, Vector.empty)
    def reduce(b: Sketch, a: HV): Sketch =
      if (b.hs.length >= k &&
          (a.h > b.hs.last || (a.h == b.hs.last && a.v >= b.vs.last))) b
      else mergeSketch(b, Sketch(Vector(a.h), Vector(a.v)), k)
    def merge(x: Sketch, y: Sketch): Sketch = mergeSketch(x, y, k)
    def finish(r: Sketch): Sketch = r
    def bufferEncoder = Encoders.product[Sketch]
    def outputEncoder = Encoders.product[Sketch]
  }

  /** Union already-built sketches (the rollup side). */
  class MergeBottomK(k: Int) extends Aggregator[Sketch, Sketch, Sketch] {
    def zero: Sketch = Sketch(Vector.empty, Vector.empty)
    def reduce(b: Sketch, a: Sketch): Sketch =
      if (a == null || a.hs == null) b else mergeSketch(b, a, k)
    def merge(x: Sketch, y: Sketch): Sketch = mergeSketch(x, y, k)
    def finish(r: Sketch): Sketch = r
    def bufferEncoder = Encoders.product[Sketch]
    def outputEncoder = Encoders.product[Sketch]
  }

  def bottomK(k: Int = K) = udaf(new BottomK(k), Encoders.product[HV])
  def mergeBottomK(k: Int = K) = udaf(new MergeBottomK(k), Encoders.product[Sketch])

  // ------------------------------------------------- KMV distinct sketch

  /** KMV sample size: relative error ≈ 1/√(k−2) ≈ 6% at k = 256. */
  val KmvK = 256

  /** Hash domain: 40-bit md5 prefix. Small enough that (k−1)·2^40 stays in
    * BIGINT on both engines; large enough that same-week collisions are
    * negligible (and in any case both engines drop the SAME collisions, so
    * the oracle equality is unaffected).
    */
  val KmvBits = 40
  val KmvDomain: Long = 1L << KmvBits

  /** Distinct two-pointer merge of two sorted hash lists, truncated to k —
    * the KMV merge law: bottom-k-distinct(A ∪ B) = merge of the per-part
    * bottom-k's, exactly. Associative + commutative, duplicate hashes
    * collapse (a user seen on two days must count once at week grain).
    */
  private[graft] def mergeKmv(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0; var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val x =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v }
      if (out.isEmpty || out.last != x) out += x
    }
    out.toIndexedSeq
  }

  /** The k minimum DISTINCT hash values — the classic KMV/bottom-k distinct
    * sketch (Bar-Yossef et al. 2002). State is O(k) per group; map-side
    * partial aggregation keeps shuffle traffic to one ≤k-entry list per
    * grain regardless of fact volume.
    */
  class KmvBottomK(k: Int) extends Aggregator[Long, KmvSk, KmvSk] {
    def zero: KmvSk = KmvSk(Vector.empty)
    def reduce(b: KmvSk, h: Long): KmvSk =
      if (b.hs.length >= k && h >= b.hs.last) b
      else KmvSk(mergeKmv(b.hs, Vector(h), k))
    def merge(x: KmvSk, y: KmvSk): KmvSk = KmvSk(mergeKmv(x.hs, y.hs, k))
    def finish(r: KmvSk): KmvSk = r
    def bufferEncoder = Encoders.product[KmvSk]
    def outputEncoder = Encoders.product[KmvSk]
  }

  /** Union already-built KMV sketches (the rollup side). */
  class KmvMerge(k: Int) extends Aggregator[KmvSk, KmvSk, KmvSk] {
    def zero: KmvSk = KmvSk(Vector.empty)
    def reduce(b: KmvSk, a: KmvSk): KmvSk =
      if (a == null || a.hs == null) b else KmvSk(mergeKmv(b.hs, a.hs, k))
    def merge(x: KmvSk, y: KmvSk): KmvSk = KmvSk(mergeKmv(x.hs, y.hs, k))
    def finish(r: KmvSk): KmvSk = r
    def bufferEncoder = Encoders.product[KmvSk]
    def outputEncoder = Encoders.product[KmvSk]
  }

  def kmvBottomK(k: Int = KmvK) = udaf(new KmvBottomK(k), Encoders.scalaLong)
  def kmvMerge(k: Int = KmvK) = udaf(new KmvMerge(k), Encoders.product[KmvSk])

  /** Mergeable distinct-count rollup: per-day KMV sketches of the user-id
    * hash, distinct-merged to weekly sketches, estimate read off the k-th
    * smallest hash — `(k−1)·2^40 div h_k`, all exact integer arithmetic.
    * Unlike an HLL estimate (whose register math no SQL oracle reproduces),
    * every number here is a deterministic function of the distinct-hash
    * SET, so the DuckDB oracle takes bottom-k over the week's distinct
    * hashes directly and the hash-equality check verifies the day→week
    * merge law itself — the same contract [[quantileSketchRollup]] pins
    * for quantiles. The fact table is scanned once at day grain; week
    * grain touches only ≤k-entry sketches.
    */
  def kmvDistinctRollup(events: DataFrame): DataFrame = {
    import graft.ops.Synth
    val base = Synth.eventTime(events).select(
        date_trunc("week", col("ts")).as("week"),
        date_trunc("day", col("ts")).as("day"),
        expr(s"cast(conv(substring(md5(cast(user_id as string)), 1, ${KmvBits / 4}), 16, 10) as bigint)")
          .as("h"))
      .distinct()
    val daily = base.groupBy(col("week"), col("day"))
      .agg(kmvBottomK()(col("h")).as("sk"))
    val weekly = daily.groupBy(col("week"))
      .agg(kmvMerge()(col("sk.hs")).as("sk"), count(lit(1)).as("n_days"))
    weekly.select(unix_micros(col("week")).as("week_us"), col("n_days"),
        when(size(col("sk.hs")) < KmvK, size(col("sk.hs")).cast("long"))
          .otherwise(expr(
            s"(${KmvK - 1}L * ${KmvDomain}L) div greatest(element_at(sk.hs, $KmvK), 1L)"))
          .as("est_weekly_users"))
      .orderBy(col("week_us"))
  }

  /** 60-bit priority hash from an md5 hex prefix — same family as Dedup. */
  private def md5i(c: String): String =
    s"cast(conv(substring(md5(cast($c as string)), 1, 15), 16, 10) as bigint)"

  /** Discrete sample quantile: element at rank max(ceil(q·n), 1) of the
    * value-sorted sample — an element pick, no interpolation arithmetic, so
    * engines agree bitwise.
    */
  private def pick(q: Double): Column =
    round(element_at(array_sort(col("sk.vs")),
      greatest(ceil(lit(q) * size(col("sk.vs"))), lit(1L)).cast("int")), 2)

  /** Two-level rollup: per-day bottom-k sketches of order totals, merged to
    * weekly sketches, quantiles read off the weekly sample. The fact table
    * is scanned ONCE at day grain; the week grain touches only sketches.
    */
  def quantileSketchRollup(orders: DataFrame): DataFrame = {
    val base = orders.select(
      date_trunc("week", col("o_orderdate")).as("week"),
      date_trunc("day", col("o_orderdate")).as("day"),
      expr(md5i("o_orderkey")).as("h"),
      col("o_totalprice").cast("double").as("v"))
    val daily = base.groupBy(col("week"), col("day"))
      .agg(bottomK()(col("h"), col("v")).as("sk"))
    val weekly = daily.groupBy(col("week"))
      .agg(mergeBottomK()(col("sk.hs"), col("sk.vs")).as("sk"))
    weekly.select(col("week"),
        size(col("sk.vs")).cast("long").as("n_sample"),
        pick(0.25).as("p25"), pick(0.5).as("p50"), pick(0.75).as("p75"))
      .orderBy(col("week"))
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quantile_sketch_rollup" -> ((s, d) => quantileSketchRollup(Tables.orders(s, d))),
    "kmv_distinct_rollup" -> ((s, d) => kmvDistinctRollup(Tables.events(s, d))),
  )

  /** The oracle takes bottom-k per WEEK in one shot — equal to the Spark
    * side's day→week sketch merge iff the merge is exact, which is the
    * property under test.
    */
  def oracleSql: Map[String, String] = Map(
    "quantile_sketch_rollup" ->
      """WITH base AS (
        |  SELECT date_trunc('week', o_orderdate) AS week,
        |    ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT AS h,
        |    o_totalprice::DOUBLE AS v
        |  FROM orders
        |), ranked AS (
        |  SELECT week, v,
        |    row_number() OVER (PARTITION BY week ORDER BY h, v) AS rn
        |  FROM base
        |), samples AS (
        |  SELECT week, list(v ORDER BY v) AS vs
        |  FROM ranked WHERE rn <= 64 GROUP BY week
        |)
        |SELECT week, len(vs)::BIGINT AS n_sample,
        |  round(vs[greatest(ceil(0.25 * len(vs)), 1)::INT], 2) AS p25,
        |  round(vs[greatest(ceil(0.5 * len(vs)), 1)::INT], 2) AS p50,
        |  round(vs[greatest(ceil(0.75 * len(vs)), 1)::INT], 2) AS p75
        |FROM samples ORDER BY week""".stripMargin,
    // One-shot week-grain bottom-k over DISTINCT hashes — equal to the
    // Spark day→week distinct-merge iff the KMV merge law holds exactly.
    "kmv_distinct_rollup" ->
      s"""WITH base AS (
         |  SELECT DISTINCT date_trunc('week', ts) AS week,
         |    ('0x' || substr(md5(user_id::VARCHAR), 1, ${KmvBits / 4}))::BIGINT AS h
         |  FROM events
         |), days AS (
         |  SELECT date_trunc('week', ts) AS week,
         |    count(DISTINCT date_trunc('day', ts))::BIGINT AS n_days
         |  FROM events GROUP BY 1
         |), ranked AS (
         |  SELECT week, h, row_number() OVER (PARTITION BY week ORDER BY h) AS rn
         |  FROM base
         |), agg AS (
         |  SELECT week, count(*)::BIGINT AS nh,
         |    max(CASE WHEN rn = $KmvK THEN h END) AS hk
         |  FROM ranked WHERE rn <= $KmvK GROUP BY week
         |)
         |SELECT epoch_us(a.week) AS week_us, d.n_days,
         |  CASE WHEN nh < $KmvK THEN nh
         |       ELSE (${KmvK - 1} * $KmvDomain) // greatest(hk, 1) END
         |    AS est_weekly_users
         |FROM agg a JOIN days d ON a.week = d.week
         |ORDER BY week_us""".stripMargin,
  )
}
