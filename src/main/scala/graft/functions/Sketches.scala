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
  )
}
