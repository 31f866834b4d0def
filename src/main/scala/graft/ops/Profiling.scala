package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-layout diagnostics: the profiles an engine operator (or a human)
  * consults BEFORE choosing a partition strategy. The reference ships no
  * equivalent; at 100 TB these are the first queries run against a new
  * table, because every later plan choice (salting, AQE thresholds, bucket
  * counts) hangs off the key distribution they report.
  */
object Profiling {

  /** Key-skew profile of the event stream's user dimension: per-key counts
    * bucketed by binary magnitude (bucket = bit-length of the count, so
    * bucket b holds keys with 2^(b-1) ≤ count < 2^b). The output is the
    * log-scale frequency histogram a partition planner reads — a healthy
    * key is a low bucket; a hot key shows up as a lonely top bucket with a
    * huge rows share. All integer: magnitudes come from the binary-digit
    * LENGTH of the count (both engines print exact binary), never
    * `floor(log2(x))` whose libm rounding can disagree AT power-of-two
    * boundaries.
    *
    * Scale shape: one high-cardinality groupBy (user_id) with map-side
    * partial counts, then a ~64-row bucket aggregate — the second shuffle
    * is constant-size regardless of fact volume.
    */
  def skewProfile(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perKey = events.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    // The rows total comes from the BUCKET rows (≤ 64 of them — counts are
    // Longs), not a second aggregate branch over perKey: that would scan
    // and shuffle the fact table twice. The unpartitioned window funnels
    // only the 64-row histogram to one task, not data.
    perKey
      .withColumn("bucket", length(conv(col("cnt"), 10, 2)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"))
      .withColumn("total_rows", sum(col("n_rows")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("bucket"), col("n_keys"), col("n_rows"), col("max_cnt"),
        expr("(n_rows * 1000000) div total_rows").as("rows_ppm"))
      .orderBy(col("bucket"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_profile" -> ((s, d) => skewProfile(Tables.events(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "skew_profile" ->
      """WITH k AS (
        |  SELECT user_id, count(*)::BIGINT AS cnt FROM events GROUP BY 1
        |), b AS (
        |  SELECT len(printf('%b', cnt))::BIGINT AS bucket, cnt FROM k
        |), t AS (SELECT sum(cnt)::BIGINT AS total_rows FROM k)
        |SELECT bucket, count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS n_rows,
        |  max(cnt)::BIGINT AS max_cnt,
        |  (sum(cnt)::BIGINT * 1000000 // total_rows)::BIGINT AS rows_ppm
        |FROM b, t
        |GROUP BY bucket, total_rows ORDER BY bucket""".stripMargin,
  )
}
