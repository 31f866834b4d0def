package graft

import java.sql.Timestamp

import graft.sources.Cdc

/** CDC envelope semantics: op filter and the 3-way timestamp normalization
  * (property-style: many seeded random instants round-trip per wire shape).
  */
class CdcSpec extends SparkSpec {

  test("opFilter keeps c/u/r and drops d") {
    import spark.implicits._
    val env = Cdc.envelope(
      Seq(
        (0L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 1.0, "{}"),
        (1L, Timestamp.valueOf("2024-01-01 00:00:01"), 1L, "click", 1.0, "{}"),
        (2L, Timestamp.valueOf("2024-01-01 00:00:02"), 1L, "click", 1.0, "{}"),
        (3L, Timestamp.valueOf("2024-01-01 00:00:03"), 1L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val kept = Cdc.opFilter(env).select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L)) // event_id 3 → __op 'd' → dropped
    assert(env.count() == 4)
  }

  test("normalizeTs round-trips every wire shape over random instants") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 60 instants across 2024 with microsecond precision; event_id fixes the
    // wire shape: 0 → micros+Z, 1 → seconds+Z, 2 → plain.
    val cases = (0 until 60).map { i =>
      val us = 1704067200000000L + (rnd.nextDouble() * 31536000000000L).toLong
      val shape = i % 3
      val expected = if (shape == 0) us else (us / 1000000L) * 1000000L
      (i.toLong * 3 + shape, us, expected)
    }
    val df = cases.toDF("event_id", "us", "expected")
      .selectExpr("event_id", "timestamp_micros(us) as ts", "expected",
        "1 as user_id", "'click' as event_type", "1.0 as value", "'{}' as props")
    val bad = Cdc.normalizeTs(Cdc.envelope(df).join(df.select("event_id", "expected"), "event_id"), "ts_str")
      .selectExpr("event_id", "unix_micros(ts_str) as got", "expected")
      .where("got IS NULL OR got <> expected")
      .count()
    assert(bad == 0)
  }

  test("wire strip removes exactly the 5-byte header") {
    import spark.implicits._
    val df = Seq(("MAGICpayload", 1)).toDF("payload", "x")
    val out = Cdc.stripWireHeader(df, "payload").select("payload").head().getString(0)
    assert(out == "payload")
  }

  test("snapshot compaction: latest op per key wins, trailing delete drops the key") {
    import spark.implicits._
    // user 1: ops at t0..t2, latest (event_id 6, %4=2 → 'r') keeps the row
    // with its value; user 2: latest op is event_id 7 (%4=3 → delete) → the
    // key disappears; user 3: same-ms tie broken by higher event_id.
    val ev = Seq(
      (4L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 10.0, "{}"),
      (5L, Timestamp.valueOf("2024-01-01 00:00:01"), 1L, "click", 20.0, "{}"),
      (6L, Timestamp.valueOf("2024-01-01 00:00:02"), 1L, "click", 30.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "click", 1.0, "{}"),
      (7L, Timestamp.valueOf("2024-01-01 00:00:01"), 2L, "click", 2.0, "{}"),
      (8L, Timestamp.valueOf("2024-01-01 00:00:05"), 3L, "click", 5.0, "{}"),
      (10L, Timestamp.valueOf("2024-01-01 00:00:05"), 3L, "click", 6.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val snap = Cdc.snapshot(Cdc.envelope(ev)).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("last_event_id"), r.getAs[Double]("last_value"))).toMap
    assert(snap == Map(1L -> (6L, 30.0), 3L -> (10L, 6.0))) // user 2 deleted
  }

  test("reconciliation flags exactly the buckets whose keys changed") {
    import spark.implicits._
    // Keys 1 and 257 share bucket 1 (mod 256). Key 1 is unchanged across
    // the split; key 257 changes value after it; key 300 (bucket 44) is
    // added after the split; key 2 (bucket 2) is unchanged.
    val ev = Seq(
      (4L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 10.0, "{}"),
      (8L, Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "click", 7.0, "{}"),
      (12L, Timestamp.valueOf("2024-01-01 00:00:00"), 257L, "click", 1.0, "{}"),
      (500L, Timestamp.valueOf("2024-01-01 00:01:00"), 257L, "click", 2.0, "{}"),
      (504L, Timestamp.valueOf("2024-01-01 00:01:00"), 300L, "click", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Cdc.snapshotReconcile(Cdc.envelope(ev)).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("old_n"), r.getAs[Long]("new_n"))).toMap
    // Bucket 1: same cardinality (2 keys both sides) but key 257's row
    // hash changed → xor mismatch catches what the count alone cannot.
    // Bucket 44: appears only in the new snapshot. Bucket 2 is clean.
    assert(out == Map(1L -> (2L, 2L), 44L -> (0L, 1L)))
  }
}
