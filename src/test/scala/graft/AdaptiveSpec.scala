package graft

import scala.jdk.CollectionConverters._

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

  /** VERDICT r5 #9 — skew pin for the exact-Jaccard prefix join
    * (`Dedup.jaccardPrefixJoin`). Finding: the bucket cap ALREADY prevents
    * join-key skew structurally, so AQE never needs to split:
    *
    *   - the candidate join keys on PREFIX tokens, and a token only enters
    *     prefixes when it is among a doc's rarest — a token hot enough to
    *     skew a partition (shared by thousands of docs) has high df and is
    *     ordered out of the prefix unless the docs have no rarer tokens;
    *   - in that degenerate case (planted here: a 3 000-doc identical
    *     clique, every token df = 3 000) the [[graft.ops.Dedup.MaxBucketSize]]
    *     cap drops the bucket outright (the documented recall cap), so no
    *     join key ever exceeds MaxBucketSize rows per side.
    *
    * The pin measures the EXECUTED workload, not the plan: per-task shuffle
    * read bytes across the query's heaviest shuffle stage stay within the
    * production skew ratio (max ≤ 5× median — the default
    * `skewedPartitionFactor` AQE would use to call a partition skewed).
    */
  test("the prefix-join verify path stays under the AQE skew ratio on a planted hot clique") {
    val keep = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    // Track per-task shuffle-read volume per stage; the skew ratio is
    // evaluated within the heaviest shuffle stage (events are async — the
    // settle loop below waits for the task count to stop moving).
    val reads = new java.util.concurrent.ConcurrentHashMap[Int, java.util.List[Long]]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.shuffleReadMetrics.totalBytesRead > 0) {
          reads.computeIfAbsent(te.stageId,
              _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Long]()))
            .add(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    try {
      // Enough partitions that the median is meaningful (2 would make any
      // hot partition the median); coalescing disabled so fixture-scale
      // shuffles don't collapse to one task and hide the distribution.
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.sparkContext.addSparkListener(listener)

      // 8k original docs, each a 19-token body (18 unique + shared filler)
      // with a near-copy appending one token: inter 19 / union 20 = exactly
      // the 19/20 threshold. Plus the degenerate 3k-identical clique whose
      // every token has df = 3000.
      import spark.implicits._
      val nDocs = 8000L
      val body = (0 until 18)
        .map(j => concat(lit("w"), col("id"), lit(s"_$j")))
        .reduce((a, b) => concat(a, lit(" "), b))
      val originals = spark.range(nDocs)
        .select(col("id").as("doc_id"), concat(body, lit(" the")).as("text"))
      val copies = spark.range(nDocs)
        .select((col("id") + nDocs).as("doc_id"),
          concat(body, lit(" the x"), col("id")).as("text"))
      val clique = spark.range(3000)
        .select((col("id") + 10 * nDocs).as("doc_id"),
          lit((0 until 20).map(i => s"c$i").mkString(" ")).as("text"))
      val corpus = originals.unionByName(copies).unionByName(clique)

      val pairs = graft.ops.Dedup.jaccardPrefixJoin(corpus).collect()
      // Every original-copy pair found; the clique contributes nothing (its
      // buckets are over the cap — the documented recall tradeoff).
      assert(pairs.length == nDocs,
        s"expected $nDocs planted pairs, got ${pairs.length}")
      assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + nDocs))

      // Settle: task-end events arrive async after collect() returns.
      var last = -1
      var settle = 0
      while (settle < 20 && reads.values.asScala.map(_.size).sum != last) {
        last = reads.values.asScala.map(_.size).sum
        Thread.sleep(200); settle += 1
      }
      val heaviest = reads.asScala.values.map(_.asScala.toVector)
        .filter(_.size >= 4) // ratio is meaningless on 1-2 task stages
        .maxBy(_.sum)
      val sorted = heaviest.sorted
      val median = math.max(1L, sorted(sorted.size / 2))
      val ratio = sorted.last.toDouble / median
      assert(ratio <= 5.0,
        s"prefix-join shuffle skew ratio $ratio exceeds the AQE skew factor " +
          s"(tasks: min ${sorted.head}, median $median, max ${sorted.last} bytes)")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      keep.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
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
