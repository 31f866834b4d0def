package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's required settings and the scale knobs
  * documented in one place.
  *
  * Local/test sizing here; at cluster scale the same builder applies with
  * different numbers:
  *   - `spark.sql.shuffle.partitions`: target ~128-200 MB per post-shuffle
  *     partition (AQE coalescing trims the tail) — at 100 TB input that is
  *     O(100k) initial partitions, not the local 32.
  *   - `spark.sql.files.maxPartitionBytes` 128-256 MB keeps scan tasks
  *     executor-memory-safe.
  *   - AQE is left ON (default in Spark 4): runtime re-plan gives skew-join
  *     splitting and dynamic broadcast decisions that static tuning can't.
  *   - `spark.sql.session.timeZone=UTC` is load-bearing: every date_format /
  *     epoch expression in the engine assumes it (oracle parity).
  *   - `nanosAsLong`: the driver fixtures store TIMESTAMP(NANOS), which the
  *     Spark 4 parquet reader otherwise rejects; `Tables.events` converts.
  *   - `GraftExtensions` registers the native `vec_dot` expression.
  */
object Session {

  def builder(appName: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // Lets a DSv2 scan's reported KeyGroupedPartitioning reach the
      // planner (gavro tables written repartitionByRange report it via
      // the `partitionKey` reader option) — clustered aggs/joins over
      // index tables then skip their Exchange entirely.
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")

  def local(appName: String): SparkSession = {
    val cores = math.min(32, Runtime.getRuntime.availableProcessors)
    val s = builder(appName, cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
