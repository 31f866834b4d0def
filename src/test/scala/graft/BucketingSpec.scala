package graft

import graft.sources.Bucketing

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
}
