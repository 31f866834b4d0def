package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.{AlertStateMachine, KvSink}

/** ScalaCheck properties for the pure (Spark-free) logic. */
object PureProps extends Properties("graft.pure") {

  private val evalSeqs: Gen[List[Boolean]] = Gen.listOf(Gen.oneOf(true, false))

  property("alert machine fires iff >= 3 consecutive breaches") =
    forAll(evalSeqs) { evals =>
      val finalState = evals.foldLeft(AlertStateMachine.initial)(
        (s, b) => AlertStateMachine.step(s, b))
      val trailing = evals.reverse.takeWhile(identity).length
      (finalState.status == "firing") == (trailing >= 3) &&
        finalState.consecutive == trailing
    }

  property("alert machine status is a pure function of the trailing run") =
    forAll(evalSeqs, evalSeqs) { (prefixA, prefixB) =>
      val tail = List(true, false, true)
      def run(evals: List[Boolean]) =
        evals.foldLeft(AlertStateMachine.initial)((s, b) => AlertStateMachine.step(s, b))
      run(prefixA ++ tail).status == run(prefixB ++ tail).status
    }

  private val metric: Gen[Double] = Gen.chooseNum(-1e6, 1e6)

  property("trend is 0 when previous is missing or zero") =
    forAll(metric) { cur =>
      KvSink.computeTrend(cur, None) == 0.0 &&
        KvSink.computeTrend(cur, Some(0.0)) == 0.0
    }

  property("trend sign matches direction of change") =
    forAll(metric, Gen.chooseNum(0.001, 1e6)) { (cur, prev) =>
      val t = KvSink.computeTrend(cur, Some(prev))
      Prop(
        if (cur > prev) t >= 0.0
        else if (cur < prev) t <= 0.0
        else t == 0.0).label(s"cur=$cur prev=$prev t=$t")
    }

  property("trend of an unchanged metric is 0") =
    forAll(Gen.chooseNum(0.001, 1e6)) { v =>
      KvSink.computeTrend(v, Some(v)) == 0.0
    }
}
