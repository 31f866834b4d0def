package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.ops.{Activity, Alerts, Frames}

/** Golden tests for the windowed frames over tiny hand-built inputs. */
class FramesSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Events fully inside one 15-minute window plus one in the next. */
  private def tinyEvents: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, ts("2024-01-01 00:01:00"), 1L, "purchase", 10.0, """{"k": 1}"""),
      (1L, ts("2024-01-01 00:02:00"), 2L, "signup", 0.0, """{"k": 2}"""),
      (2L, ts("2024-01-01 00:03:00"), 3L, "error", 5.0, """{"k": 3}"""),
      (3L, ts("2024-01-01 00:04:00"), 4L, "click", 2.0, """{"k": 4}"""),
      (4L, ts("2024-01-01 00:16:00"), 5L, "view", 3.0, """{"k": 5}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("trafficFrame counts tumbling 15-minute windows") {
    val rows = Frames.trafficFrame(tinyEvents).orderBy("timestamp").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("value") == 4L)
    assert(rows(1).getAs[Long]("value") == 1L)
    // window [00:00, 00:15) ends at 00:15:00 UTC
    assert(rows(0).getAs[Long]("timestamp") == 1704068100000L)
    assert(rows(0).getAs[String]("label") == "12:15:00 AM")
  }

  test("kpiFrame aggregates the union with errorRate guard and median") {
    val rows = Frames.kpiFrame(tinyEvents).orderBy("updatedAt").collect()
    // sliding 30m/10m: first four events land in 3 windows each
    val w = rows.filter(_.getAs[Long]("updatedAt") == 1704068400000L) // end 00:20
    assert(w.length == 1)
    assert(w(0).getAs[Long]("activeUsers") == 1L)
    assert(w(0).getAs[Double]("revenue") == 10.0)
    assert(w(0).getAs[Long]("orders") == 1L)
    // window [23:50, 00:20) also catches the 00:16 view: 1 error / 3 requests
    assert(w(0).getAs[Double]("errorRate") == 33.33)
    // latencies 500, 200, 300 → exact median 300
    assert(w(0).getAs[Long]("latency") == 300L)
  }

  test("kpiFrame errorRate greatest() guard avoids div-by-zero") {
    import spark.implicits._
    val onlyOrders = Seq((0L, ts("2024-01-01 00:01:00"), 1L, "purchase", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Frames.kpiFrame(onlyOrders).collect()
    assert(rows.forall(_.getAs[Double]("errorRate") == 0.0))
    assert(rows.forall(_.getAs[Long]("latency") == 0L)) // null median coalesced
  }

  test("platformFrame filters null platforms and counts the rest") {
    val rows = Frames.platformFrame(tinyEvents).orderBy("name").collect()
    // event_id 0 is dropped (pmod 11 == 0); the others map via user_id % 3
    assert(rows.map(_.getAs[Long]("value")).sum == 4L)
    assert(rows.forall(_.getAs[String]("name") != null))
  }

  test("healthFrame coalesces empty conditional aggregates to zero") {
    import spark.implicits._
    val noViews = Seq((0L, ts("2024-01-01 00:01:00"), 1L, "purchase", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Frames.healthFrame(noViews).collect()
    assert(rows.forall(_.getAs[Long]("cpu_centi") == 0L))
    assert(rows.forall(_.getAs[String]("apiClusterStatus") == "HEALTHY"))
  }

  test("activity feed maps actions and formats locations") {
    val rows = Activity.activityFeed(tinyEvents).orderBy("id").collect()
    val byId = rows.map(r => r.getAs[String]("id") -> r).toMap
    assert(byId("evt_0").getAs[String]("action") == "purchase")
    assert(byId("evt_0").getAs[Double]("amount") == 10.0)
    assert(byId("evt_1").getAs[String]("action") == "login")
    assert(byId("evt_1").getAs[Any]("amount") == null)
    assert(byId("evt_3").getAs[String]("action") == "cart")
    // event_id 0: city_0 + US → "city_0, US" (both present)
    assert(byId("evt_0").getAs[String]("location") == "city_0, US")
    assert(byId("evt_0").getAs[String]("timestamp").startsWith("2024-01-01T00:01:00.000"))
  }

  test("kpi approx latency (percentile_approx) stays within the rank-error bound of exact") {
    import org.apache.spark.sql.functions._
    // percentile_approx's contract (accuracy=10000 → rank error ≤ n/10000,
    // i.e. exact rank at fixture sizes) is that it returns an ELEMENT of
    // the group at the target rank, where exact `percentile` interpolates
    // the two middle elements — on sparse windows the VALUES can differ by
    // half a neighbor gap, so the drop-in bound is the rank contract
    // itself: every approx median must be one of the (at most two) middle
    // elements of its window's latency multiset.
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
    val approx = Frames.kpiFrame(events, approxLatency = true)
      .select(col("updatedAt"), col("latency").as("approx"))
    val exact = Frames.kpiFrame(events)
      .select(col("updatedAt"), col("latency").as("exact"))
    val els = Frames.kpiNormalize(events)
      .filter(col("latency_ms").isNotNull)
      .groupBy(window(col("event_time"), "30 minutes", "10 minutes"))
      .agg(sort_array(collect_list(floor(col("latency_ms")).cast("long"))).as("lats"))
      .select((unix_timestamp(col("window.end")) * 1000).as("updatedAt"), col("lats"))
    val joined = approx.join(exact, "updatedAt")
      .join(els, Seq("updatedAt"), "left").collect()
    assert(joined.length > 1000)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx")
      val lats = r.getAs[scala.collection.Seq[Long]]("lats")
      if (lats == null) assert(a == 0L && r.getAs[Long]("exact") == 0L)
      else {
        val n = lats.length
        val mids = Set(lats((n - 1) / 2), lats(n / 2))
        assert(mids.contains(a),
          s"approx $a not a middle element of $lats at ${r.getAs[Long]("updatedAt")}")
      }
    }
  }

  test("alertFrame fans out one row per rule with threshold status") {
    val alerts = Alerts.alertFrame(Frames.kpiFrame(tinyEvents))
    val rows = alerts.collect()
    assert(rows.length % Alerts.rules.length == 0)
    val byRule = rows.groupBy(_.getAs[String]("id"))
    assert(byRule.keySet == Set("alert_1", "alert_2", "alert_3"))
    // latency 350 ≥ 200 → firing for windows containing requests
    assert(byRule("alert_1").exists(_.getAs[String]("status") == "firing"))
    assert(byRule("alert_3").forall(_.getAs[String]("status") == "pending"))
  }

  test("HLL rollup: unioned day sketches estimate weekly distincts within bound") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
    val rollup = Frames.hllRollup(events).collect()
      .map(r => r.getAs[Long]("week_us") ->
        r.getAs[Long]("est_weekly_users").toDouble).toMap
    val exact = graft.ops.Synth.eventTime(events)
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime * 1000L) -> r.getAs[Long]("n")).toMap
    assert(rollup.keySet == exact.keySet)
    // DataSketches HLL at default lgK=12: relative standard error ~1.6%;
    // 5% is a comfortable deterministic bound at fixture cardinalities.
    rollup.foreach { case (w, est) =>
      val n = exact(w).toDouble
      assert(math.abs(est - n) / n <= 0.05, s"week=$w est=$est exact=$n")
    }
  }
}
