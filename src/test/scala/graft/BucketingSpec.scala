package graft

import graft.sources.{Bucketing, Tables}

/** Co-located bucketed join: both sides bucketed on the join key at write
  * time → the join plans with no shuffle exchange. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange (or its absence) shows
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = (0 until 1000).map(i => (i.toLong % 50, s"l$i")).toDF("user_id", "l")
      val right = (0 until 1000).map(i => (i.toLong % 50, s"r$i")).toDF("user_id", "r")
      Bucketing.writeBucketed(left, "bucketed_left", "user_id", 8)
      Bucketing.writeBucketed(right, "bucketed_right", "user_id", 8)
      val joined = spark.table("bucketed_left")
        .join(spark.table("bucketed_right"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected a shuffle-free co-located join, got:\n$plan")
      assert(joined.count() == 20000L) // 50 keys × 20 × 20
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_left")
      spark.sql("DROP TABLE IF EXISTS bucketed_right")
    }
  }

  test("partitioned write prunes directories and keeps one file per partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Bucketing.writePartitioned(docs, dir, Seq("lang"), Seq("doc_id"))
    // Hive-style partition directories exist...
    val langDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang=")).map(_.getName)
    assert(langDirs.nonEmpty)
    // ...each with exactly one data file (repartition before partitionBy —
    // the small-files guard), containing doc_id-sorted rows.
    langDirs.foreach { ld =>
      val files = new java.io.File(s"$dir/$ld").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$ld has ${files.length} files")
    }
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    // A filter on the partition column reaches the scan as a PartitionFilter
    // (pruning), not a post-scan Filter.
    val pruned = back.filter($"lang" === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"))
    val sparkCount = docs.filter($"lang" === "en").count()
    assert(pruned.count() == sparkCount)
    // Within a file, rows are doc_id-clustered (sorted write).
    val ids = spark.read.parquet(s"$dir/${langDirs.head}")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Fact laid out partitioned-by-lang; the query's lang set arrives only
    // through a JOIN against a dim filtered on a NON-partition attribute,
    // so static pruning can't see it — at 100 TB this is the difference
    // between scanning every date/tenant directory and only the ones the
    // dim filter selects. DPP injects the dim's keys as a runtime partition
    // filter on the fact scan (reusing the broadcast the join builds
    // anyway).
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Bucketing.writePartitioned(docs, dir, Seq("lang"), Seq("doc_id"))
    val langs = docs.select("lang").distinct().as[String].collect().sorted
    assert(langs.length >= 2, langs.toSeq)
    val picked = langs.head
    // The dim must be a real (file) relation: a local Seq-backed dim gets
    // its filter constant-folded into a LocalRelation during optimization,
    // and DPP then sees no filtering predicate at all.
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    langs.map(l => (l, if (l == picked) "keep" else "drop"))
      .toSeq.toDF("lang", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    // AQE wraps executed stages in leaf QueryStageExec nodes that `collect`
    // can't descend into; DPP itself is orthogonal to AQE, so pin the plan
    // with AQE off for an inspectable tree.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val fact = spark.read.parquet(dir)
      // An explicit comparison, not a bare boolean attribute: DPP only
      // fires behind a LIKELY-SELECTIVE dim predicate (comparison/In/Like);
      // a naked boolean column doesn't qualify (and `b === true` folds back
      // to one), so the filter compares a string tag.
      val joined = fact.join(dim.filter(col("tag") === "keep"), "lang")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getString(0)).toSeq == Seq(picked))
      assert(rows.head.getLong(1) ==
        docs.filter(col("lang") === picked).count())

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val factScan = finalPlan.collectWithSubqueries {
        case s: FileSourceScanExec if s.relation.location.rootPaths
          .exists(_.toString.contains("graft-dpp")) => s
      }.head
      // The runtime pruning filter is attached to the PARTITION filters…
      assert(factScan.partitionFilters.exists(f => f.collectFirst {
        case d: org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression => d
      }.isDefined), factScan.partitionFilters.mkString("; "))
      // …and it actually pruned: only the selected lang's directory was read.
      assert(factScan.metrics("numFiles").value == 1L,
        s"numFiles=${factScan.metrics("numFiles").value}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("compaction rewrites only the many-file partitions, data unchanged") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // Five append batches → every partition dir accumulates ~5 small files.
    (0 until 5).foreach { b =>
      (0 until 20).map(i => (b * 20L + i, s"t$b-$i", if (i % 2 == 0) "en" else "de"))
        .toDF("doc_id", "text", "lang")
        .repartition(2)
        .write.partitionBy("lang").mode("append").parquet(dir)
    }
    val beforeRows = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    def files(lang: String): Int =
      new java.io.File(dir, s"lang=$lang").listFiles()
        .count(_.getName.endsWith(".parquet"))
    assert(files("en") >= 5 && files("de") >= 5, (files("en"), files("de")))

    val report = Bucketing.compact(spark, dir, "lang")
    assert(files("en") == 1 && files("de") == 1)
    // Report carries the before/after audit per partition.
    assert(report.forall { case (_, b, a) => b >= 5 && a == 1 }, report)
    // Compaction is a pure layout change: row set identical.
    val afterRows = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(afterRows == beforeRows)
    // Idempotence: a second pass finds nothing dirty and rewrites nothing.
    val f = new java.io.File(dir, "lang=en").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val mtime = f.lastModified()
    val report2 = Bucketing.compact(spark, dir, "lang")
    assert(report2.forall { case (_, b, a) => b == 1 && a == 1 }, report2)
    assert(f.lastModified() == mtime, "clean partition was rewritten")
  }

  test("z-order layout clusters BOTH dimensions per file; linear sort only one") {
    import org.apache.spark.sql.functions._
    val zdir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("graft-linear").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(pmod(col("o_orderkey"), lit(65536)).as("x"),
        pmod(col("o_custkey"), lit(65536)).as("y"))
    Bucketing.writeZOrdered(orders, zdir, "x", "y", 16)
    // linear layout: same file count, sorted by x alone
    orders.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(ldir)
    // Per-file min/max of the SECOND dimension = what parquet row-group
    // stats would prune on a y-filter.
    def avgYSpan(path: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col("y")) - min(col("y"))).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length
    }
    val (zy, ly) = (avgYSpan(zdir), avgYSpan(ldir))
    // x-sorted files each cover ~the full y range; z-ordered files cover a
    // bounded rectangle. Require at least a 2x tighter y-spread (observed:
    // ~4x on this fixture).
    assert(zy < ly / 2.0, s"z-order avg y-span $zy not < half of linear $ly")
    // and the z-ordered layout still clusters x (files cover disjoint-ish
    // x rectangles, not the full range)
    def avgXSpan(path: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col("x")) - min(col("x"))).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length
    }
    val globalX = 65536.0
    assert(avgXSpan(zdir) < globalX * 0.8, "z-order should also bound x per file")
  }
}
