package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE runtime re-planning under skew — the other half of the skew story
  * next to the salted two-phase rank (Tpch.topCustomersPerSegment): for
  * plain shuffle joins, the engine relies on adaptive skew-join splitting
  * rather than hand-salting every join. This pins that the relied-upon
  * behavior actually engages: a hot key whose partition exceeds the skew
  * threshold is split at runtime (SortMergeJoin(skew=true)).
  */
class AdaptiveSpec extends SparkSpec {

  test("a hot join key is split by AQE skew handling at runtime") {
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // Thresholds scaled down to fixture volume; ratios as in production.
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // Force a shuffle join: a broadcast would hide the skew entirely.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // Enough partitions that the median is a NON-hot partition (skew is
      // judged against the median; with 2 partitions the hot one is it).
      spark.conf.set("spark.sql.shuffle.partitions", "16")

      import spark.implicits._
      val pad = "x" * 100
      // 95% of fact rows share key 1; the rest spread over 1000 keys.
      val fact = spark.range(0, 60000)
        .select(when(col("id") % 20 =!= 0, 1L).otherwise(col("id") % 1000).as("k"),
          concat(col("id").cast("string"), lit(pad)).as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"),
        concat(lit("dim"), col("id").cast("string")).as("name"))
      val joined = fact.join(dim, "k")
      // collect() drives THIS Dataset's QueryExecution (count() would spawn
      // a separate one and leave this adaptive plan unexecuted/initial).
      assert(joined.collect().length == 60000)

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n${finalPlan.take(3000)}")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Runtime row-level filtering: when a shuffle join's small side carries a
    * selective predicate, the optimizer builds a Bloom filter over its join
    * keys and pushes a might_contain probe into the BIG side's scan — at
    * 100 TB this drops most fact rows at the scan instead of shipping them
    * to the join. Thresholds here are scaled to fixture volume; the
    * production defaults (creation ≤ 100MB build side, application ≥ 10GB
    * scan) engage on exactly the dimension-filtered fact joins this repo's
    * relational queries run.
    */
  test("a selective dim filter injects a runtime Bloom filter into the fact scan") {
    val keep = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtimeFilter.number.threshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1B")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val dir = "/root/testdata/sf0.001"
      val orders = graft.sources.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val lineitem = graft.sources.Tables.lineitem(spark, dir)
      val joined = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      // creation side: bloom_filter_agg over the filtered dim keys;
      // application side: a might_contain probe on the fact key.
      assert(optimized.contains("bloom_filter_agg"),
        s"no bloom filter build side:\n${optimized.take(3000)}")
      assert(optimized.contains("might_contain"),
        s"no bloom filter probe on the fact side:\n${optimized.take(3000)}")
      assert(joined.count() > 0)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
