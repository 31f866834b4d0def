package graft

/** THE canonicality rule, in one place for every measurement harness
  * (Bench, StreamBench, ScaleSmoke): a run's numbers are citable
  * round-over-round only when the host was idle when its clock started —
  * 1-minute AND 5-minute loadavg below the gate
  * (`SPARK_GRAFT_CANONICAL_LOAD`, default 2.0). Unmeasurable load (no
  * /proc/loadavg) stays TRUSTING: inability to measure is not evidence
  * of contention, and stamping false would permanently disable the
  * regression gates on such hosts. The rule is load-bearing — it decides
  * which artifacts PROGRESS may cite and which runs bench_compare may
  * call regressions — so the three harnesses must share one
  * implementation, not three copies that can drift.
  */
object Canonical {

  def readLoadavg(): Array[Double] =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").take(3)
      .map(_.toDouble)
    catch { case _: Throwable => Array.empty[Double] }

  def loadMax: Double =
    sys.env.getOrElse("SPARK_GRAFT_CANONICAL_LOAD", "2.0").toDouble

  /** The gate, judged from the run's OWN starting conditions. */
  def isCanonical(loadavgStart: Array[Double]): Boolean =
    loadavgStart.length < 2 ||
      (loadavgStart(0) < loadMax && loadavgStart(1) < loadMax)
}
