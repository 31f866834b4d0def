package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Lloyd

/** Pins the driver-side Lloyd engine's exactness contract — the semantics
  * that make it bit-identical to the DataFrame recursion it replaced
  * (struct-min assignment, `sum div n` updates, lost-centroid carry) and
  * to the DuckDB oracle unroll. The end-to-end equality is separately
  * hash-verified by every ann_* oracle query; this spec pins the three
  * spots where a driver-side reimplementation could silently drift. */
class LloydSpec extends AnyFunSuite {

  test("md5Hex matches Spark's md5(cast(x as string)) rendering") {
    // Reference digests computed independently (python hashlib).
    assert(Lloyd.md5Hex("42") === "a1d0c6e83f027327d8461063f4ac58a6")
    assert(Lloyd.md5Hex("-7") === "74687a12d3915d3c4d83f1af7b3683d5")
  }

  test("update is integer mean with Spark div semantics: truncate toward zero") {
    // One centroid, two members summing to -5 over 2 → Spark `-5 div 2` =
    // -2 (toward zero), NOT -3 (floor). Residual-space PQ training feeds
    // negative components, so this branch is live.
    val sample = Array(Array(-1L), Array(-4L))
    val out = Lloyd.run(sample, Array(Array(0L)), iters = 1)
    assert(out.map(_.toSeq).toSeq === Seq(Seq(-2L)))
    // Positive control.
    val pos = Lloyd.run(Array(Array(1L), Array(4L)), Array(Array(0L)), 1)
    assert(pos.map(_.toSeq).toSeq === Seq(Seq(2L)))
  }

  test("assignment ties keep the lowest centroid index (struct-min order)") {
    // Two identical centroids: every member must land on index 0, so
    // centroid 1 loses all members and keeps its seed position.
    val sample = Array(Array(10L), Array(20L))
    val out = Lloyd.run(sample, Array(Array(15L), Array(15L)), iters = 1)
    assert(out(0).toSeq === Seq(15L)) // (10+20) div 2
    assert(out(1).toSeq === Seq(15L)) // lost: keeps previous position
  }

  test("a centroid that lost all members keeps its previous position") {
    val sample = Array(Array(0L, 0L))
    val out = Lloyd.run(sample,
      Array(Array(1L, 1L), Array(900L, 900L)), iters = 2)
    assert(out(0).toSeq === Seq(0L, 0L))
    assert(out(1).toSeq === Seq(900L, 900L))
  }

  test("iters=0 returns the seeds unchanged (the seed-pick contract)") {
    val seeds = Array(Array(3L), Array(9L))
    val out = Lloyd.run(Array(Array(5L)), seeds, iters = 0)
    assert(out.map(_.toSeq).toSeq === seeds.map(_.toSeq).toSeq)
  }
}
