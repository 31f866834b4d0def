package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GavroPartitionReader
import graft.sources.GavroPartitionReader.{CLeaf, CPred, CSlotMap, CTree, InHashStr}

/** Direct same-JVM comparison of the two compiled forms of the
  * slot-scoped probe disjunction — the generic Or-walk (O(branches) leaf
  * evals per row) vs the r17 CSlotMap hash dispatch (two hash probes).
  * Wall-level A/B at the sf0.1 bench fixture cannot resolve this (1 MiB
  * blocks → a few thousand decoded rows, eval is sub-millisecond total);
  * the per-row cost is what scales with decoded candidates at 100 TB, so
  * it is measured HERE, on identical rows, forms alternating in one JVM.
  * Correctness (equality on every row) is asserted; timings are
  * printed for the round record, never asserted (host-dependent). */
class GavroEvalBenchSpec extends AnyFunSuite {

  private def key(s: Int, i: Int): String = s"k${s}_$i"

  test("CSlotMap dispatch equals the generic tree on every row, and its per-row cost is measured") {
    val slots = 48
    val keysPerSlot = 12
    // The probe shape: (slot = s AND key IN keys_s) OR ...
    val branches = (0 until slots).map { s =>
      val set = new java.util.HashSet[UTF8String](keysPerSlot * 2)
      (0 until keysPerSlot).foreach(i => set.add(UTF8String.fromString(key(s, i))))
      CTree("and", Array[CPred](
        CLeaf(0, "=", s), CLeaf(1, "in", InHashStr(set))))
    }
    val tree: CPred = CTree("or", branches.toArray[CPred])
    val m = new java.util.HashMap[java.lang.Long, java.util.HashSet[UTF8String]]()
    (0 until slots).foreach { s =>
      val set = new java.util.HashSet[UTF8String](keysPerSlot * 2)
      (0 until keysPerSlot).foreach(i => set.add(UTF8String.fromString(key(s, i))))
      m.put(s.toLong, set)
    }
    val dispatch: CPred = CSlotMap(0, 1, m)

    // 64k rows, ~6% hits, the rest misses in-slot (the decode-survivor
    // population block pruning leaves behind: right slot, absent key).
    val rnd = new scala.util.Random(17)
    val rows: Array[InternalRow] = Array.tabulate(1 << 16) { _ =>
      val s = rnd.nextInt(slots)
      val hit = rnd.nextInt(16) == 0
      val k = if (hit) key(s, rnd.nextInt(keysPerSlot))
        else s"m${rnd.nextInt(1 << 20)}"
      new GenericInternalRow(Array[Any](s, UTF8String.fromString(k)))
    }
    rows.foreach { r =>
      assert(GavroPartitionReader.evalPred(tree, r) ==
        GavroPartitionReader.evalPred(dispatch, r))
    }
    // null slot / null key rows: FALSE-vs-UNKNOWN is the documented
    // top-level-only equivalence — both verdicts drop the row.
    Seq(new GenericInternalRow(Array[Any](null, UTF8String.fromString("x"))),
        new GenericInternalRow(Array[Any](3, null)))
      .foreach { r =>
        assert(GavroPartitionReader.evalPred(tree, r) != 1)
        assert(GavroPartitionReader.evalPred(dispatch, r) != 1)
      }

    def time(p: CPred): Double = {
      var acc = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < rows.length) {
        acc += GavroPartitionReader.evalPred(p, rows(i))
        i += 1
      }
      val dt = (System.nanoTime() - t0).toDouble / rows.length
      assert(acc > 0) // keep the loop observable
      dt
    }
    // Alternate forms; min over reps after JIT warm-up.
    (1 to 3).foreach { _ => time(tree); time(dispatch) }
    val (tT, tD) = (1 to 7).map(_ => (time(tree), time(dispatch)))
      .reduce((a, b) => (math.min(a._1, b._1), math.min(a._2, b._2)))
    info(f"generic or-walk: $tT%.1f ns/row; slot-map dispatch: $tD%.1f ns/row; ratio ${tT / tD}%.2fx")
  }
}
