package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporal operators beyond the reference's window set: gap-based
  * sessionization and an as-of join. Both are single-pass, user-partitioned
  * plans — the partitioning key (user_id) is high-cardinality, so the work
  * spreads across the cluster with one shuffle and no skew funnel.
  */
object Temporal {

  /** Gap-based sessionization via Spark's native `session_window` (30-minute
    * inactivity gap): start = first event, end = last event + gap. The
    * oracle reproduces it with the classic islands construction
    * (lag → gap flag → running sum).
    */
  def userSessions(events: DataFrame): DataFrame =
    Synth.eventTime(events)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start_us"))

  /** As-of join: every event annotated with the user's most recent purchase
    * at-or-before it. Expressed as one `last(..., ignoreNulls)` running
    * window over the user's timeline — no join at all, which beats any
    * range-join formulation at scale (a single shuffle on user_id, then a
    * sorted pass).
    */
  def asofLastPurchase(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Synth.eventTime(events)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_purchase_value",
        last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true).over(w))
      .withColumn("last_purchase_ts_us",
        last(when(col("event_type") === "purchase", unix_micros(col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("last_purchase_value"), col("last_purchase_ts_us"))
      .orderBy(col("event_id"))
  }

  /** Interval (range) join, bin-bucketed: events joined to campaign windows
    * they fall inside. A naive `ts BETWEEN start AND end` theta join is a
    * broadcast-nested-loop (quadratic at scale); because every interval here
    * is bounded (24 h), each side is keyed by the day bins it touches and
    * the range predicate only runs WITHIN equi-join buckets — the standard
    * binning reduction that turns a range join into a shuffle/broadcast
    * hash join plus a residual filter. Campaigns are derived
    * deterministically from the data (one 24 h window per observed day,
    * offset +6 h so every window spans a bin boundary and the multi-bin
    * explode is actually exercised).
    */
  def campaignIntervalJoin(events: DataFrame): DataFrame = {
    val e = Synth.eventTime(events)
    val campaigns = e.select(date_trunc("day", col("ts")).as("d")).distinct()
      .select(col("d"),
        (col("d") + expr("INTERVAL 6 HOURS")).as("start_ts"),
        (col("d") + expr("INTERVAL 30 HOURS")).as("end_ts"))
    // Explode each interval to the day bins it overlaps (here: d and d+1).
    val campaignBins = campaigns
      .select(col("d"), col("start_ts"), col("end_ts"),
        explode(sequence(col("d"), col("d") + expr("INTERVAL 1 DAY"),
          expr("INTERVAL 1 DAY"))).as("bin"))
    val eventBins = e.withColumn("bin", date_trunc("day", col("ts")))
    eventBins.join(broadcast(campaignBins), Seq("bin"))
      .filter(col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(unix_micros(col("d")).as("campaign_day_us"),
        col("n_events"), col("total_value"))
      .orderBy(col("campaign_day_us"))
  }

  /** Event-transition matrix (the funnel/Markov view): per user-timeline
    * `lag` pairs each event with its predecessor, then a global count per
    * (prev → next) transition. One shuffle on the high-cardinality user_id
    * for the lag window, one map-side-combined aggregation over the tiny
    * transition-type space. Ties on the second-resolution fixture ts break
    * by event_id (log order) so the pairing is deterministic.
    */
  /** Cohort retention matrix: users grouped by first-activity week, counted
    * in each later week they return — the standard growth-analytics view
    * over an events table. Shape: distinct (user, week) first (one shuffle,
    * heavy dedup map-side), a per-user min for the cohort, one user-keyed
    * join, then a tiny (cohort × offset) agg. No window functions, no
    * self-join over raw events; at 100 TB the only wide row set is the
    * distinct user-week pairs, ~|users| × active weeks.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val uw = Synth.eventTime(events)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val cohorts = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    uw.join(cohorts, "user_id")
      // day diffs between week-truncated stamps are exact multiples of 7
      .select(unix_micros(col("cohort_week")).as("cohort_week_us"),
        (datediff(col("week"), col("cohort_week")) / lit(7)).cast("long").as("week_offset"))
      .groupBy(col("cohort_week_us"), col("week_offset"))
      // (user, week) is already distinct → plain count IS distinct users
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week_us"), col("week_offset"))
  }

  /** Per-entity outlier detection (2σ rule) in EXACT integer arithmetic:
    * |x − μ| > 2σ is evaluated as (n·x − S)²·(n−1) > 4·n·(n·Q − S²) over
    * integer cents (S = Σx, Q = Σx²) — no float mean, no float variance,
    * no sqrt, so the flag is bit-deterministic and hash-exact across
    * engines. Shape: one groupBy for the per-user moments, one key join
    * back; both shuffles on the high-cardinality user key.
    *
    * Exact up to ~10⁴ events × 10⁵ cents per entity before the cubic term
    * nears BIGINT range — comfortably beyond per-entity event counts; a
    * 100 TB global variant would normalize to per-window moments first.
    */
  def userValueAnomalies(events: DataFrame): DataFrame = {
    val e = Synth.eventTime(events)
      .select(col("user_id"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
    val stats = e.groupBy(col("user_id")).agg(
      count(lit(1)).as("n"),
      sum(col("cents")).as("s"),
      sum(col("cents") * col("cents")).as("q"))
    e.join(stats, "user_id")
      .filter(col("n") >= 3)
      .withColumn("dev", col("n") * col("cents") - col("s"))
      .filter(col("dev") * col("dev") * (col("n") - 1) >
        lit(4) * col("n") * (col("n") * col("q") - col("s") * col("s")))
      .select(col("user_id"), col("event_id"), col("cents"))
      .orderBy(col("user_id"), col("event_id"))
  }

  def eventTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Synth.eventTime(events)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("prev_type"), col("next_type"), col("n"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** RANGE-frame rolling window: at every event, the user's value total
    * over the trailing hour BY EVENT TIME (`rangeBetween` over epoch
    * seconds), not the trailing N rows — rows and time diverge whenever
    * event density varies, which is always. Partitioned by the
    * high-cardinality user key; one shuffle, sorted pass per user.
    */
  def rollingHourValue(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Synth.eventTime(events)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-3600L, 0L)
    // Exact integer cents, not a double sum: within a RANGE frame the
    // engines may fold ties in different orders, and double addition is
    // order-sensitive at the ulp; integer sums are order-free.
    e.withColumn("cents", floor(col("value") * 100).cast("long"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        sum(col("cents")).over(w).as("rolling_1h_cents"),
        count(lit(1)).over(w).as("rolling_1h_events"))
      .orderBy(col("event_id"))
  }

  /** EWMA lookback: the newest event weighs 2^7, each older event half
    * that, truncated at 8 events — so the smoothed value is a pure
    * integer (cents × 128) and the oracle equality is exact. A
    * multiplicative-decay EWMA over an unbounded tail needs either floats
    * (engine-divergent) or a recursive scan (not in SQL); the 8-term
    * truncation keeps >99% of the mass at λ=1/2 and makes the operator a
    * plain bounded ROWS frame — the shape that scales (one user-keyed
    * shuffle, sorted pass, O(8) state per row). */
  val EwmaTerms = 8

  /** Exponentially-weighted moving value per user: for each event, the
    * decayed sum over the user's last [[EwmaTerms]] events (this one
    * included), weight 2^(7-age) on integer cents. Frame order is pinned
    * by (ts, event_id) so ties cannot reorder between engines. The
    * weighted fold runs map-side over the frame's `collect_list` — with
    * L oldest-first of size m, the sum is
    * `(Σ_i L[i]·2^i) · 2^(8-m)` — two shifts, no per-position branch. */
  def ewmaUserValue(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Synth.eventTime(events)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("cents", floor(col("value") * 100).cast("long"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(-(EwmaTerms - 1), 0)
    e.select(col("event_id"), col("user_id"), col("us"),
        collect_list(col("cents")).over(w).as("tail"))
      .select(col("event_id"), col("user_id"), col("us"),
        expr(s"""aggregate(transform(tail, (x, i) -> shiftleft(x, i)),
          0L, (acc, x) -> acc + x) * shiftleft(1L, $EwmaTerms - size(tail))""")
          .as("ewma128"))
      .orderBy(col("event_id"))
  }

  /** Max allowed delay between consecutive funnel stages (µs). */
  val FunnelHopUs: Long = 24L * 3600 * 1000000

  /** Ordered conversion funnel: per user, first `view`, first `click`
    * strictly after it, first `purchase` strictly after that — each hop
    * within [[FunnelHopUs]]. The MATCH_RECOGNIZE-style sequence pattern,
    * expressed as filtered min-aggregations chained by key joins: stage
    * N's frame is (user, t_{N-1}) → one user-keyed shuffle per stage, no
    * windows, no per-user event sorting. All time arithmetic in integer
    * MICROSECONDS on both engines (a raw timestamp compare would diverge
    * where DuckDB keeps nanos Spark truncated).
    *
    * Output is the funnel report: per stage, users reaching it and the
    * average hop delay in whole seconds (integer division — exact).
    */
  def conversionFunnel(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("us") > col("t_view") && col("us") <= col("t_view") + FunnelHopUs)
      .groupBy(col("user_id"), col("t_view")).agg(min(col("us")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("us") > col("t_click") && col("us") <= col("t_click") + FunnelHopUs)
      .groupBy(col("user_id"), col("t_click")).agg(min(col("us")).as("t_purchase"))
    def report(df: DataFrame, stage: String, hopExpr: String) = df.agg(
      count(lit(1)).as("n_users"),
      coalesce(expr(s"(sum($hopExpr) div count(1)) div 1000000"), lit(0L))
        .cast("long").as("avg_hop_secs"))
      .select(lit(stage).as("stage"), col("n_users"), col("avg_hop_secs"))
    report(v, "1_view", "0")
      .unionByName(report(c, "2_click", "t_click - t_view"))
      .unionByName(report(p, "3_purchase", "t_purchase - t_click"))
      .orderBy(col("stage"))
  }

  /** Calendar-spine densification with gap detection: generate the full
    * day spine between the corpus bounds, cross it with the (tiny)
    * event-type dimension, and anti-join the observed (type, day) pairs —
    * the days each type went silent. The missing-row problem is the dual
    * of aggregation (absent facts produce NO row, so "which days had
    * nothing" needs a generated spine), and the shape here — bounded
    * generated dims crossed small-side, facts only ever aggregated — is
    * the one that survives scale: the spine is O(days × types) regardless
    * of fact volume.
    */
  def activityCalendar(events: DataFrame): DataFrame = {
    val days = events
      .agg(min(date_trunc("day", col("ts"))).as("d0"),
        max(date_trunc("day", col("ts"))).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val types = events.select(col("event_type")).distinct()
    val active = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val spine = days.crossJoin(broadcast(types))
    spine.join(active, Seq("event_type", "day"), "left_anti")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gap_days"))
      .join(types, Seq("event_type"), "right")
      .select(col("event_type"),
        coalesce(col("n_gap_days"), lit(0L)).cast("long").as("n_gap_days"))
      .orderBy(col("event_type"))
  }

  /** Attribution lookback window: a purchase is credited to the latest
    * click/view at most 30 minutes before it (else channel = "direct"). */
  val AttrWindowUs: Long = 30L * 60 * 1000000

  /** Last-touch attribution, join-free: the naive formulation is a range
    * self-join (every purchase × every prior touch within the window —
    * quadratic on active users); instead ONE user-partitioned running
    * window carries the latest touch's timestamp and type via
    * `last(..., ignoreNulls)` over rows strictly before the current one,
    * and the 30-minute credit test is a residual projection. One shuffle
    * on high-cardinality user_id, a sorted pass, no join — the same shape
    * as [[asofLastPurchase]], specialized with the lookback-window credit
    * rule marketing attribution actually uses. The two `last` calls share
    * one window frame, so they resolve to the same touch row (their CASE
    * inputs are null on exactly the same rows). Reference analog: the
    * event→action classification feed (src/streaming/activity_feed.py) —
    * this is the attribution view a step downstream of it.
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Synth.eventTime(events)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("click", "view")
    val credited = col("lt_us").isNotNull &&
      unix_micros(col("ts")) - col("lt_us") <= AttrWindowUs
    // Both window columns in ONE select so CollapseWindow keeps a single
    // Window node (two chained withColumns leave two stacked nodes — same
    // shuffle+sort, but two evaluation passes).
    e.select(col("*"),
        last(when(isTouch, unix_micros(col("ts"))), ignoreNulls = true)
          .over(w).as("lt_us"),
        last(when(isTouch, col("event_type")), ignoreNulls = true)
          .over(w).as("lt_type"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(credited, col("lt_type")).otherwise(lit("direct")).as("channel"),
        when(credited, (unix_micros(col("ts")) - col("lt_us")) / lit(1000000L))
          .cast("long").as("touch_age_s"))
      .orderBy(col("event_id"))
  }

  /** Per-user value trend: exact integer least-squares slope of spend over
    * time. x = day index (datediff from the corpus epoch), y = integer
    * cents; the slope num/den pair (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) is
    * emitted unreduced so everything stays BIGINT-exact — no float
    * regression, no per-user sort, one groupBy shuffle computing all five
    * moments in a single pass. Day-grain x keeps Σx² far from overflow for
    * any realistic per-user volume (x ≤ ~40k days; a corpus needing more
    * headroom swaps the sums to DECIMAL(38,0), same plan). Users with <2
    * events or a single active day have no defined slope and are excluded
    * in both engines.
    */
  def userValueTrend(events: DataFrame): DataFrame = {
    val e = Synth.eventTime(events).select(col("user_id"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long").as("x"),
      floor(col("value") * 100).cast("long").as("y"))
    e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope_num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("slope_den", col("n") * col("sxx") - col("sx") * col("sx"))
      .filter(col("n") >= 2 && col("slope_den") > 0)
      .select(col("user_id"), col("n"), col("slope_num"), col("slope_den"),
        when(col("slope_num") > 0, 1).when(col("slope_num") < 0, -1)
          .otherwise(0).as("direction"))
      .orderBy(col("user_id"))
  }

  /** [[meanShiftDays]] windows (recent vs prior active-day counts) and the
    * shift threshold: a changepoint is a recent mean at least
    * [[ShiftNum]]/[[ShiftDen]] (25%) above or below the prior level. */
  private val ShiftRecent = 3
  private val ShiftPrior = 14
  private val ShiftNum = 5L
  private val ShiftDen = 4L

  /** Rolling mean-shift changepoint detection on the daily value series:
    * for each (event_type, day), compare the mean daily cents over the
    * [[ShiftRecent]] most recent active days against the mean over the
    * [[ShiftPrior]] active days before them, and flag days where the
    * recent level moved at least 25% up or down — the window-expressible
    * changepoint test (a CUSUM's recursive fold needs a sequential pass;
    * the two-window mean shift is pure ROWS frames, so it stays inside
    * WindowExec with map-side-combinable day pre-aggregation below it).
    * The comparison is cross-multiplied exact integers: with r = recent
    * sum and p = prior sum, "recent mean > 5/4 × prior mean" is
    * `4 · prior_n · r > 5 · recent_n · p` — no division anywhere.
    *
    * Shape: the corpus collapses to (type, day) grain in one groupBy;
    * the windows run per type over O(calendar) rows — bounded by days,
    * not volume. Gaps: frames count ACTIVE days (a silent day is absent),
    * which is the level the series actually has; only days with a full
    * prior window are judged.
    */
  def meanShiftDays(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Synth.eventTime(events)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val recent = w.rowsBetween(-(ShiftRecent - 1), 0)
    val prior = w.rowsBetween(-(ShiftPrior + ShiftRecent - 1), -ShiftRecent)
    daily
      .withColumn("r_sum", sum(col("cents")).over(recent))
      .withColumn("r_n", count(lit(1)).over(recent))
      .withColumn("p_sum", sum(col("cents")).over(prior))
      .withColumn("p_n", count(lit(1)).over(prior))
      .filter(col("p_n") === ShiftPrior) // full history only
      .withColumn("shift",
        when(lit(ShiftDen) * col("p_n") * col("r_sum") >
          lit(ShiftNum) * col("r_n") * col("p_sum"), "up")
          .when(lit(ShiftNum) * col("p_n") * col("r_sum") <
            lit(ShiftDen) * col("r_n") * col("p_sum"), "down"))
      .filter(col("shift").isNotNull)
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("cents"), col("r_sum"), col("r_n"), col("p_sum"), col("p_n"),
        col("shift"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Day-of-week seasonality profile: per (event_type, weekday) volume and
    * integer-cent value, with each cell's ppm share of its type's total —
    * the weekly-rhythm view capacity planning and anomaly baselines read.
    * Two tiny aggregations: the corpus collapses to ≤ types×7 rows in one
    * map-side-combinable groupBy, and the share window runs over that
    * 35-row grid (partitioned by type — never corpus-grain). Weekday is
    * Monday=0 in both engines (Spark `weekday`, DuckDB `isodow − 1`).
    */
  def dowProfile(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Synth.eventTime(events)
      .select(col("event_type"), weekday(col("ts")).cast("long").as("dow"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .withColumn("type_total",
        sum(col("n")).over(Window.partitionBy(col("event_type"))))
      .select(col("event_type"), col("dow"), col("n"), col("cents"),
        expr("(n * 1000000) div type_total").as("share_ppm"))
      .orderBy(col("event_type"), col("dow"))
  }

  // ------------------------------------------------------- RFM segmentation

  /** Micros per day, and the quartile cut count. */
  private val DayUs = 86400000000L

  /** Range-bucket width for [[rfmSegments]]' two-level prefix sum. */
  private val QuartileBucketW = 1024L

  /** RFM (recency / frequency / monetary) customer segmentation with
    * value-grain quartile scoring — the classic marketing rollup, built
    * WITHOUT `ntile() OVER (ORDER BY …)`: a global ntile funnels every
    * customer through one sorted partition, the exact shape that dies at
    * a billion users. Instead each metric's quartile comes from the
    * value-grain histogram (a map-side-combinable groupBy onto the
    * metric's distinct values) with a TWO-LEVEL exclusive prefix sum:
    *
    *   1. shard the histogram by a coarse order-preserving range bucket
    *      (`value div `[[QuartileBucketW]]) and prefix-sum WITHIN each
    *      bucket — a partitioned window, parallelism = bucket count;
    *   2. roll the per-bucket totals into one sorted array and fold it
    *      with the higher-order `aggregate` into per-bucket exclusive
    *      offsets — a single-row reduce over O(range / 1024) entries,
    *      broadcast back.
    *
    * cum_before(v) = bucket_offset(v div W) + within_bucket_before(v).
    * No step sorts more than one bucket's slice of the histogram in one
    * task. The bucket count is O(value_range / 1024): recency spans a few
    * thousand day counts and frequency a few hundred counts (≤ 1 bucket
    * each); monetary is a per-user lifetime dollar sum whose RANGE is
    * bounded by the biggest spender (≈10^7 for a $10M whale → ~10^4
    * buckets), even though its distinct-value COUNT grows with the user
    * population — the fold row stays KBs at a billion users. Ties share a
    * score by construction (value-based quantiles).
    *
    * Scores: recency 4 = most recent (fewest days since last purchase);
    * frequency / monetary 4 = top quartile. The segment label is the
    * standard coarse read of the (R, F) pair.
    */
  def rfmSegments(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val purchases = Synth.eventTime(events)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100).cast("long").as("cents"))
    // Anchor = the corpus's newest purchase: a broadcast 1-row aggregate,
    // so "days since" is reproducible (no wall clock in the plan).
    val anchor = purchases.agg(max(col("us")).as("anchor_us"))
    // `per` feeds the output AND all three quartile histograms. Lazy
    // persist() raced: the three quartile subtrees broadcast as CONCURRENT
    // jobs and each re-computed the un-cached rollup (profiled: 44 jobs,
    // 135 s of queued stage wall at sf0.1). The eager localCheckpoint
    // materializes the per-user rollup exactly once before the fan-out.
    val per = purchases.groupBy(col("user_id"))
      .agg(count(lit(1)).as("freq"), sum(col("cents")).as("cents"),
        max(col("us")).as("last_us"))
      .crossJoin(broadcast(anchor))
      .withColumn("rec_days", expr(s"(anchor_us - last_us) div $DayUs"))
      .withColumn("mon_grain", expr("cents div 100"))
      .localCheckpoint(true)
    // Quartile index of each distinct metric value: (4 · |users with a
    // strictly smaller value|) div n, clamped to 0..3.
    def grainQuartile(metric: String): DataFrame = {
      val hist = per.groupBy(col(metric)).agg(count(lit(1)).as("cnt"))
        .withColumn("bucket", expr(s"$metric div $QuartileBucketW"))
      // Level 1: exclusive prefix sum inside each range bucket.
      val local = hist.withColumn("loc_before",
        coalesce(sum(col("cnt")).over(Window.partitionBy(col("bucket"))
          .orderBy(col(metric).asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // Level 2: exclusive offsets of the buckets themselves — fold the
      // sorted (bucket, total) array in one row; O(range/1024) entries.
      val offsets = hist.groupBy(col("bucket")).agg(sum(col("cnt")).as("tot"))
        .agg(sort_array(collect_list(struct(col("bucket"), col("tot")))).as("bt"))
        .select(explode(expr(
          """aggregate(bt,
            |  struct(cast(0 as bigint) as run,
            |         cast(array() as array<struct<bucket:bigint,off:bigint>>) as out),
            |  (acc, x) -> named_struct(
            |    'run', acc.run + x.tot,
            |    'out', array_append(acc.out,
            |             named_struct('bucket', x.bucket, 'off', acc.run))),
            |  acc -> acc.out)""".stripMargin)).as("bo"))
        .select(col("bo.bucket").as("bucket"), col("bo.off").as("bucket_off"))
      val nTotal = per.agg(count(lit(1)).as("n_total"))
      local.join(broadcast(offsets), Seq("bucket"))
        .crossJoin(broadcast(nTotal))
        .withColumn("cum_before", col("bucket_off") + col("loc_before"))
        .select(col(metric),
          least(lit(3L), expr("(4 * cum_before) div n_total")).as(s"${metric}_q"))
    }
    per
      .join(broadcast(grainQuartile("rec_days")), Seq("rec_days"))
      .join(broadcast(grainQuartile("freq")), Seq("freq"))
      .join(broadcast(grainQuartile("mon_grain")), Seq("mon_grain"))
      // Recency inverts (small days-since = best); the others rank up.
      .withColumn("r_score", lit(4L) - col("rec_days_q"))
      .withColumn("f_score", lit(1L) + col("freq_q"))
      .withColumn("m_score", lit(1L) + col("mon_grain_q"))
      .withColumn("segment",
        when(col("r_score") >= 3 && col("f_score") >= 3, lit("champion"))
          .when(col("r_score") >= 3, lit("recent"))
          .when(col("f_score") >= 3, lit("at_risk"))
          .otherwise(lit("hibernating")))
      .select(col("user_id"), col("rec_days"), col("freq"), col("cents"),
        col("r_score"), col("f_score"), col("m_score"), col("segment"))
      .orderBy(col("user_id"))
  }

  // --------------------------------------------------------- session paths

  /** Path truncation and report size for [[sessionPaths]]. */
  private val PathSteps = 8
  private val TopPaths = 20

  /** Top navigation paths: sessionize each user's timeline (30-minute
    * inactivity islands), render each session as its first [[PathSteps]]
    * event types joined with `>`, and report the [[TopPaths]] most common
    * paths — the flow/Sankey rollup of "how do users actually move".
    *
    * Shape: the islands construction is one user-keyed window (high
    * cardinality, one shuffle + sorted pass); the per-session collect is
    * BOUNDED IN AGG STATE, not just in output — a per-session
    * `row_number()` (partitioned window, same exchange as the islands
    * pass) guards the collect with `CASE WHEN rn <= 8`, and `collect_list`
    * skips the NULLs, so a pathological million-event bot session holds
    * at most [[PathSteps]] structs in its aggregation buffer while
    * `count(*)` still reports the true length; the path census is a
    * map-side-combinable groupBy on the path string; and the final top-20
    * rank filter plans through the bounded [[graft.plans.TopK]] operator
    * (global-rank form), so only ≤ k paths per partition cross the last
    * exchange.
    */
  def sessionPaths(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val sessions = Synth.eventTime(events)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
          .when(lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = sessions
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("us"), col("event_id"))))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        expr(s"""array_join(transform(
                |  array_sort(collect_list(
                |    CASE WHEN rn <= $PathSteps THEN struct(us, event_id, event_type) END)),
                |  s -> s.event_type), '>')""".stripMargin)
          .as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path").asc)).cast("long"))
      .filter(col("rnk") <= TopPaths)
      .select(col("rnk"), col("path"), col("n_sessions"), col("n_events"))
      .orderBy(col("rnk"))
  }

  // --------------------------------------------------- MAD robust outliers

  /** 3σ-equivalent MAD multiplier in 1e-4 units: 3 · 1.4826 = 4.4478. */
  private val MadK1e4 = 44478L

  /** Robust per-type outlier detection: |x − median| > 3 · 1.4826 · MAD,
    * the median-absolute-deviation rule that (unlike
    * [[userValueAnomalies]]'s moment form) a single extreme value cannot
    * drag — mean/σ have breakdown point 0, median/MAD survive 50%
    * contamination. Everything is exact integer arithmetic on cents: both
    * medians are `percentile_disc(0.5)` (lower median — the smallest
    * value whose running count reaches ⌈n/2⌉) computed on the VALUE-GRAIN
    * histogram, and the flag is the cross-multiplied comparison
    * `10000·dev > [[MadK1e4]]·mad` — no float quantile, no libm, so the
    * flag is bit-deterministic across engines.
    *
    * Shape: two histogram aggregations (map-side combinable; windows run
    * per event_type over O(distinct cents) rows, never corpus grain) and
    * two broadcast joins back onto the event scan. At 100 TB the cents
    * grain of a price-like column is bounded by the price book, not the
    * row count — the same argument as [[rfmSegments]]'s monetary grain.
    */
  def madAnomalies(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // value IS NOT NULL up front: Spark windows sort NULLS FIRST, DuckDB
    // NULLS LAST — dropping nulls before the histograms keeps the two
    // engines' cumulative counts (hence medians) aligned on nullable input.
    // `e` feeds the med histogram, the dev join, and the output — persist
    // so the event scan runs once (Verify/Bench clearCache() per query).
    // Eager, not lazy persist: `med` materializes as a concurrent
    // broadcast job and raced the main arm's cache population, scanning
    // events twice (the alert_rules/rfm persist-race pattern).
    val e = Synth.eventTime(events)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
      .localCheckpoint(true)
    // percentile_disc(0.5) of `v` per event_type, on the value grain.
    def discMedian(df: DataFrame, v: String): DataFrame =
      df.groupBy(col("event_type"), col(v)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("event_type")).orderBy(col(v).asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("cnt")).over(
          Window.partitionBy(col("event_type"))))
        .filter(col("cum") * 2 >= col("n"))
        .groupBy(col("event_type")).agg(min(col(v)).as(s"med_$v"))
    val med = discMedian(e, "cents")
    // `dev` feeds the mad histogram and the output join — eager too.
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("cents") - col("med_cents")))
      .localCheckpoint(true)
    val mad = discMedian(dev, "dev")
      .withColumnRenamed("med_dev", "mad_cents")
    dev.join(broadcast(mad), "event_type")
      .filter(col("dev") * 10000L > lit(MadK1e4) * col("mad_cents"))
      .select(col("event_id"), col("event_type"), col("cents"),
        col("med_cents"), col("mad_cents"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rolling_1h_value" -> ((s, d) => rollingHourValue(Tables.events(s, d))),
    "user_sessions" -> ((s, d) => userSessions(Tables.events(s, d))),
    "asof_last_purchase" -> ((s, d) => asofLastPurchase(Tables.events(s, d))),
    "interval_join" -> ((s, d) => campaignIntervalJoin(Tables.events(s, d))),
    "event_transitions" -> ((s, d) => eventTransitions(Tables.events(s, d))),
    "cohort_retention" -> ((s, d) => cohortRetention(Tables.events(s, d))),
    "user_value_anomalies" -> ((s, d) => userValueAnomalies(Tables.events(s, d))),
    "conversion_funnel" -> ((s, d) => conversionFunnel(Tables.events(s, d))),
    "activity_calendar" -> ((s, d) => activityCalendar(Tables.events(s, d))),
    "ewma_user_value" -> ((s, d) => ewmaUserValue(Tables.events(s, d))),
    "purchase_attribution" -> ((s, d) => purchaseAttribution(Tables.events(s, d))),
    "user_value_trend" -> ((s, d) => userValueTrend(Tables.events(s, d))),
    "dow_profile" -> ((s, d) => dowProfile(Tables.events(s, d))),
    "rfm_segments" -> ((s, d) => rfmSegments(Tables.events(s, d))),
    "session_paths" -> ((s, d) => sessionPaths(Tables.events(s, d))),
    "mad_anomalies" -> ((s, d) => madAnomalies(Tables.events(s, d))),
    "mean_shift_days" -> ((s, d) => meanShiftDays(Tables.events(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "rfm_segments" ->
      s"""WITH p AS (
         |  SELECT user_id, epoch_us(ts) AS us, floor(value * 100)::BIGINT AS cents
         |  FROM events WHERE event_type = 'purchase'
         |), per AS (
         |  SELECT user_id, count(*)::BIGINT AS freq, sum(cents)::BIGINT AS cents,
         |    ((SELECT max(us) FROM p) - max(us)) // $DayUs AS rec_days,
         |    sum(cents)::BIGINT // 100 AS mon_grain
         |  FROM p GROUP BY user_id
         |), qr AS (
         |  SELECT rec_days, least(3, 4 * coalesce(sum(cnt) OVER (ORDER BY rec_days ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // sum(cnt) OVER ()) AS q
         |  FROM (SELECT rec_days, count(*) AS cnt FROM per GROUP BY rec_days)
         |), qf AS (
         |  SELECT freq, least(3, 4 * coalesce(sum(cnt) OVER (ORDER BY freq ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // sum(cnt) OVER ()) AS q
         |  FROM (SELECT freq, count(*) AS cnt FROM per GROUP BY freq)
         |), qm AS (
         |  SELECT mon_grain, least(3, 4 * coalesce(sum(cnt) OVER (ORDER BY mon_grain ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // sum(cnt) OVER ()) AS q
         |  FROM (SELECT mon_grain, count(*) AS cnt FROM per GROUP BY mon_grain)
         |), scored AS (
         |  SELECT per.user_id, per.rec_days, per.freq, per.cents,
         |    (4 - qr.q)::BIGINT AS r_score, (1 + qf.q)::BIGINT AS f_score,
         |    (1 + qm.q)::BIGINT AS m_score
         |  FROM per JOIN qr USING (rec_days) JOIN qf USING (freq)
         |    JOIN qm USING (mon_grain)
         |)
         |SELECT user_id, rec_days, freq, cents, r_score, f_score, m_score,
         |  CASE WHEN r_score >= 3 AND f_score >= 3 THEN 'champion'
         |       WHEN r_score >= 3 THEN 'recent'
         |       WHEN f_score >= 3 THEN 'at_risk'
         |       ELSE 'hibernating' END AS segment
         |FROM scored ORDER BY user_id""".stripMargin,
    "session_paths" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
         |), marked AS (
         |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
         |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         |), numbered AS (
         |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
         |    ORDER BY us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM marked
         |), sess AS (
         |  SELECT user_id, session_id, count(*)::BIGINT AS n_events,
         |    array_to_string(list_slice(
         |      list(event_type ORDER BY us, event_id), 1, $PathSteps), '>') AS path
         |  FROM numbered GROUP BY user_id, session_id
         |), census AS (
         |  SELECT path, count(*)::BIGINT AS n_sessions,
         |    sum(n_events)::BIGINT AS n_events
         |  FROM sess GROUP BY path
         |)
         |SELECT * FROM (
         |  SELECT (row_number() OVER (ORDER BY n_sessions DESC, path ASC))::BIGINT
         |      AS rnk, path, n_sessions, n_events
         |  FROM census)
         |WHERE rnk <= $TopPaths ORDER BY rnk""".stripMargin,
    "mad_anomalies" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type, floor(value * 100)::BIGINT AS cents
         |  FROM events WHERE value IS NOT NULL
         |), med AS (
         |  SELECT event_type, min(cents) AS med_cents FROM (
         |    SELECT event_type, cents,
         |      sum(cnt) OVER (PARTITION BY event_type ORDER BY cents ASC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |      sum(cnt) OVER (PARTITION BY event_type) AS n
         |    FROM (SELECT event_type, cents, count(*) AS cnt
         |          FROM e GROUP BY event_type, cents))
         |  WHERE cum * 2 >= n GROUP BY event_type
         |), dev AS (
         |  SELECT e.*, med_cents, abs(cents - med_cents) AS dev
         |  FROM e JOIN med USING (event_type)
         |), mad AS (
         |  SELECT event_type, min(dev) AS mad_cents FROM (
         |    SELECT event_type, dev,
         |      sum(cnt) OVER (PARTITION BY event_type ORDER BY dev ASC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |      sum(cnt) OVER (PARTITION BY event_type) AS n
         |    FROM (SELECT event_type, dev, count(*) AS cnt
         |          FROM dev GROUP BY event_type, dev))
         |  WHERE cum * 2 >= n GROUP BY event_type
         |)
         |SELECT event_id, dev.event_type, cents, med_cents, mad_cents
         |FROM dev JOIN mad USING (event_type)
         |WHERE dev * 10000 > $MadK1e4 * mad_cents
         |ORDER BY event_id""".stripMargin,
    "mean_shift_days" ->
      s"""WITH daily AS (
         |  SELECT event_type, ts::DATE AS day,
         |    sum(floor(value * 100)::BIGINT)::BIGINT AS cents
         |  FROM events WHERE value IS NOT NULL
         |  GROUP BY event_type, ts::DATE
         |), win AS (
         |  SELECT event_type, day, cents,
         |    (sum(cents) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN ${ShiftRecent - 1} PRECEDING AND CURRENT ROW))::BIGINT AS r_sum,
         |    count(*) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN ${ShiftRecent - 1} PRECEDING AND CURRENT ROW) AS r_n,
         |    (sum(cents) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN ${ShiftPrior + ShiftRecent - 1} PRECEDING
         |        AND $ShiftRecent PRECEDING))::BIGINT AS p_sum,
         |    count(*) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS BETWEEN ${ShiftPrior + ShiftRecent - 1} PRECEDING
         |        AND $ShiftRecent PRECEDING) AS p_n
         |  FROM daily
         |)
         |SELECT event_type, day::VARCHAR AS day, cents, r_sum, r_n, p_sum, p_n,
         |  CASE WHEN $ShiftDen * p_n * r_sum > $ShiftNum * r_n * p_sum THEN 'up'
         |       WHEN $ShiftNum * p_n * r_sum < $ShiftDen * r_n * p_sum THEN 'down'
         |  END AS shift
         |FROM win
         |WHERE p_n = $ShiftPrior
         |  AND ($ShiftDen * p_n * r_sum > $ShiftNum * r_n * p_sum
         |    OR $ShiftNum * p_n * r_sum < $ShiftDen * r_n * p_sum)
         |ORDER BY event_type, day""".stripMargin,
    "dow_profile" ->
      """WITH e AS (
        |  SELECT event_type, (isodow(ts) - 1)::BIGINT AS dow,
        |    floor(value * 100)::BIGINT AS cents
        |  FROM events
        |), g AS (
        |  SELECT event_type, dow, count(*)::BIGINT AS n,
        |    sum(cents)::BIGINT AS cents
        |  FROM e GROUP BY event_type, dow
        |)
        |SELECT event_type, dow, n, cents,
        |  (n * 1000000 // sum(n) OVER (PARTITION BY event_type))::BIGINT AS share_ppm
        |FROM g ORDER BY event_type, dow""".stripMargin,
    "purchase_attribution" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
         |), t AS (
         |  SELECT *,
         |    last_value(CASE WHEN event_type IN ('click','view') THEN us END
         |      IGNORE NULLS) OVER w AS lt_us,
         |    last_value(CASE WHEN event_type IN ('click','view') THEN event_type END
         |      IGNORE NULLS) OVER w AS lt_type
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |)
         |SELECT event_id, user_id, us AS ts_us,
         |  CASE WHEN lt_us IS NOT NULL AND us - lt_us <= $AttrWindowUs
         |    THEN lt_type ELSE 'direct' END AS channel,
         |  (CASE WHEN lt_us IS NOT NULL AND us - lt_us <= $AttrWindowUs
         |    THEN (us - lt_us) // 1000000 END)::BIGINT AS touch_age_s
         |FROM t WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "user_value_trend" ->
      """WITH e AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS x,
        |    floor(value * 100)::BIGINT AS y
        |  FROM events
        |), m AS (
        |  SELECT user_id, count(*) AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |    sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
        |  FROM e GROUP BY user_id
        |)
        |SELECT user_id, n,
        |  n * sxy - sx * sy AS slope_num,
        |  n * sxx - sx * sx AS slope_den,
        |  (CASE WHEN n * sxy - sx * sy > 0 THEN 1
        |        WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END)::INT AS direction
        |FROM m WHERE n >= 2 AND n * sxx - sx * sx > 0
        |ORDER BY user_id""".stripMargin,
    "ewma_user_value" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS us,
         |    floor(value * 100)::BIGINT AS cents
         |  FROM events
         |), t AS (
         |  SELECT event_id, user_id, us,
         |    list(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS BETWEEN ${EwmaTerms - 1} PRECEDING AND CURRENT ROW) AS tail
         |  FROM e
         |)
         |SELECT event_id, user_id, us,
         |  (list_sum(list_transform(tail, (x, i) -> x * (1::BIGINT << (i - 1))))
         |    * (1::BIGINT << ($EwmaTerms - len(tail))))::BIGINT AS ewma128
         |FROM t ORDER BY event_id""".stripMargin,
    "activity_calendar" ->
      """WITH bounds AS (
        |  SELECT min(date_trunc('day', ts)) AS d0, max(date_trunc('day', ts)) AS d1
        |  FROM events
        |), days AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
        |), types AS (
        |  SELECT DISTINCT event_type FROM events
        |), active AS (
        |  SELECT DISTINCT event_type, date_trunc('day', ts) AS day FROM events
        |), gaps AS (
        |  SELECT t.event_type, count(*) AS n_gap_days
        |  FROM days d CROSS JOIN types t
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM active a
        |    WHERE a.event_type = t.event_type AND a.day = d.day)
        |  GROUP BY t.event_type
        |)
        |SELECT event_type, coalesce(n_gap_days, 0)::BIGINT AS n_gap_days
        |FROM types LEFT JOIN gaps USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "conversion_funnel" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
         |), v AS (
         |  SELECT user_id, min(us) AS t_view FROM e
         |  WHERE event_type = 'view' GROUP BY user_id
         |), c AS (
         |  SELECT e.user_id, t_view, min(us) AS t_click
         |  FROM e JOIN v USING (user_id)
         |  WHERE event_type = 'click' AND us > t_view AND us <= t_view + $FunnelHopUs
         |  GROUP BY e.user_id, t_view
         |), p AS (
         |  SELECT e.user_id, t_click, min(us) AS t_purchase
         |  FROM e JOIN c USING (user_id)
         |  WHERE event_type = 'purchase' AND us > t_click AND us <= t_click + $FunnelHopUs
         |  GROUP BY e.user_id, t_click
         |)
         |SELECT stage, n_users, avg_hop_secs FROM (
         |  SELECT '1_view' AS stage, count(*) AS n_users, 0::BIGINT AS avg_hop_secs FROM v
         |  UNION ALL
         |  SELECT '2_click', count(*),
         |    coalesce((sum(t_click - t_view)::BIGINT // count(*)) // 1000000, 0)::BIGINT FROM c
         |  UNION ALL
         |  SELECT '3_purchase', count(*),
         |    coalesce((sum(t_purchase - t_click)::BIGINT // count(*)) // 1000000, 0)::BIGINT FROM p
         |) ORDER BY stage""".stripMargin,
    // The oracle may use the naive theta join (it's sf-scale data); the
    // Spark side must not — that asymmetry is the point of the operator.
    "interval_join" ->
      """WITH campaigns AS (
        |  SELECT DISTINCT date_trunc('day', ts) AS d FROM events
        |)
        |SELECT epoch_us(d) AS campaign_day_us,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events JOIN campaigns
        |  ON ts >= d + INTERVAL 6 HOUR AND ts < d + INTERVAL 30 HOUR
        |GROUP BY d ORDER BY campaign_day_us""".stripMargin,
    "rolling_1h_value" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) // 1000000 AS ts_sec,
        |    floor(value * 100)::BIGINT AS cents
        |  FROM events
        |)
        |SELECT event_id, user_id, ts_us,
        |  (sum(cents) OVER (PARTITION BY user_id ORDER BY ts_sec
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))::BIGINT AS rolling_1h_cents,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts_sec
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS rolling_1h_events
        |FROM e ORDER BY event_id""".stripMargin,
    "user_value_anomalies" ->
      """WITH e AS (
        |  SELECT user_id, event_id, floor(value * 100)::BIGINT AS cents FROM events
        |), stats AS (
        |  SELECT user_id, count(*) AS n,
        |    sum(cents)::BIGINT AS s,
        |    sum(cents * cents)::BIGINT AS q
        |  FROM e GROUP BY user_id
        |)
        |SELECT user_id, event_id, cents
        |FROM e JOIN stats USING (user_id)
        |WHERE n >= 3
        |  AND (n * cents - s) * (n * cents - s) * (n - 1) >
        |      4 * n * (n * q - s * s)
        |ORDER BY user_id, event_id""".stripMargin,
    "cohort_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
        |), cohorts AS (
        |  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
        |)
        |SELECT epoch_us(cohort_week) AS cohort_week_us,
        |  (date_diff('day', cohort_week, week) / 7)::BIGINT AS week_offset,
        |  count(*) AS n_users
        |FROM uw JOIN cohorts USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "event_transitions" ->
      """WITH paired AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |)
        |SELECT prev_type, event_type AS next_type, count(*) AS n
        |FROM paired WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, next_type""".stripMargin,
    "user_sessions" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), numbered AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked
        |)
        |SELECT user_id,
        |  epoch_us(min(ts)) AS session_start_us,
        |  epoch_us(max(ts)) + 1800000000 AS session_end_us,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS session_value
        |FROM numbered GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin,
    "asof_last_purchase" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  last_purchase_value, last_purchase_ts_us
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |      OVER w AS last_purchase_value,
        |    last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER w AS last_purchase_ts_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |WHERE event_type <> 'purchase'
        |ORDER BY event_id""".stripMargin,
  )
}
