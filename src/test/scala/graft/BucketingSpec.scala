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
}
