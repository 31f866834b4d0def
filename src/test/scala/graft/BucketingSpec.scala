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
