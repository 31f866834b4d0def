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

  /** The `orders` columns the profiler reports on. String and integer
    * columns only: their string rendering is byte-identical across
    * engines, where doubles/timestamps would diverge on format. */
  val ProfileColumns = Seq("o_custkey", "o_orderstatus", "o_orderpriority")

  /** Generic column profiler — the ANALYZE-TABLE surface: one row per
    * profiled column with row/null/distinct counts, value entropy in
    * exact milli-bits (the floor-log2 `bin`-length trick — no libm),
    * and the modal value with its count (ties broken by smallest
    * value, so the row is deterministic). This is the catalog-stats
    * producer whose numbers drive broadcast thresholds, bucket counts,
    * and dictionary-encoding choices downstream.
    *
    * Scale shape, per column: one map-side-combinable groupBy onto the
    * column's value grain, a broadcast 1-row total for the entropy
    * term (the [[TextStats.unigramSurprisal]] shape), and a constant
    * union of per-column single rows. Columns profile independently —
    * on a real deployment they run as one multi-aggregate pass per
    * physical scan; at three columns the three scans read a
    * column-pruned parquet projection each, which is the same bytes.
    */
  def columnProfile(orders: DataFrame, cols: Seq[String] = ProfileColumns): DataFrame = {
    val perCol = cols.map { c =>
      val base = orders.select(col(c).cast("string").as("v"))
      val counts = base.agg(count(lit(1)).as("n_rows"),
        // coalesce: sum over zero rows is NULL, but the oracle's
        // count(*) WHERE v IS NULL is 0 — keep empty-input parity.
        coalesce(sum(when(col("v").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_nulls"))
      val hist = base.filter(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      val n = hist.agg(sum(col("cnt")).as("n"))
      val agg = hist.crossJoin(broadcast(n))
        .withColumn("bits", length(bin(expr("n div cnt"))) - 1)
        .agg(count(lit(1)).as("n_distinct"),
          expr("(1000 * sum(cnt * bits)) div max(n)").as("entropy_millibits"),
          min(struct((-col("cnt")).as("nc"), col("v"))).as("top"))
      counts.crossJoin(agg)
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("entropy_millibits"),
          col("top.v").as("top_value"), (-col("top.nc")).as("top_cnt"))
    }
    perCol.reduce(_ unionByName _).orderBy(col("column_name"))
  }

  /** The ANALYZE-TABLE verb: run [[columnProfile]] over a catalog table
    * and persist its numbers as the table's CBO statistics (row count,
    * per-column NDV/null counts, numeric min/max), so the optimizer's
    * cost model — filter selectivity, join-side size estimates, join
    * reordering — runs off measured data instead of raw file sizes. This
    * turns the profiler from a reporting operator into an engine
    * capability: after `analyzeTable`, a selective filter on a profiled
    * column shrinks the estimated build side and can flip a shuffle join
    * to broadcast (pinned in ProfilingSpec).
    *
    * Scale shape: one profile pass per column (map-side-combinable
    * value-grain aggregates — see [[columnProfile]]) plus one min/max
    * aggregate for the numeric columns; the injected statistics are
    * O(columns). Equivalent to `ANALYZE TABLE ... COMPUTE STATISTICS FOR
    * COLUMNS`, but the numbers come from the oracle-verified profiler.
    */
  /** Equi-height histogram for a numeric column — the distribution-aware
    * statistic that numRows/NDV/min-max cannot encode (a uniform range
    * estimate over skewed data is off by orders of magnitude; the CBO's
    * FilterEstimation walks these bins instead when present). Built the
    * way `ANALYZE TABLE ... FOR COLUMNS` does with
    * `spark.sql.statistics.histogram.enabled`: bin ENDPOINTS from one
    * percentile pass (so each bin holds ~n/numBins rows — equi-height),
    * then per-bin NDV from one pass over the column's VALUE GRAIN (each
    * distinct value binary-searches the 65-entry edge array — work is
    * O(ndv·log bins), never O(n·bins)). Only the numBins-row summary
    * reaches the driver.
    */
  def equiHeightHistogram(df: DataFrame, c: String, numBins: Int = 64)
      : Option[org.apache.spark.sql.catalyst.plans.logical.Histogram] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
    // Non-finite values (NaN, ±Infinity) poison percentile edges and can't
    // be binned; the histogram covers the FINITE subset (they're counted in
    // the column's other stats) — never a thrown ANALYZE.
    val vals = df.filter(col(c).isNotNull).select(col(c).cast("double").as("v"))
      .filter(!isnan(col("v")) &&
        col("v") =!= Double.PositiveInfinity && col("v") =!= Double.NegativeInfinity)
    val probs = (1 to numBins).map(_.toDouble / numBins)
    val head = vals.agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
      expr(s"percentile_approx(v, array(${probs.mkString(",")}), 100000)")
        .as("edges")).head()
    val n = head.getAs[Long]("n")
    if (n == 0L) return None
    val edges = head.getAs[Double]("lo") +: head.getSeq[Double](2)
    // Belt-and-suspenders: a non-finite edge that survived the value
    // filter degrades to no-histogram stats rather than failing the
    // ANALYZE (and edges are a typed literal, never spliced into SQL
    // text — "NaND"/"InfinityD" literals don't parse).
    if (edges.exists(e => e.isNaN || e.isInfinite)) return None
    val edgeArr = typedLit(edges)
    // value-grain bin assignment: bin i covers (edges(i-1), edges(i)]
    val ndvPerBin = vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .select(least(lit(numBins), greatest(lit(1),
        size(filter(edgeArr, e => e < col("v"))))).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("ndv"))
      .collect().map(r => r.getAs[Int]("bin") -> r.getAs[Long]("ndv")).toMap
    val bins = (1 to numBins).map(i =>
      HistogramBin(edges(i - 1), edges(i), ndvPerBin.getOrElse(i, 0L))).toArray
    Some(Histogram(n.toDouble / numBins, bins))
  }

  def analyzeTable(spark: SparkSession, table: String,
      cols: Seq[String] = ProfileColumns,
      withHistograms: Boolean = true): Unit = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
    val df = spark.table(table)
    val prof = columnProfile(df, cols).collect()
    val nRows = if (prof.isEmpty) 0L else prof.head.getAs[Long]("n_rows")
    val numericCols = cols.filter(c =>
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val mm: Map[String, (String, String)] =
      if (numericCols.isEmpty) Map.empty
      else {
        val aggs = numericCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        numericCols.map(c => c ->
          (String.valueOf(r.getAs[Any](s"min_$c")),
            String.valueOf(r.getAs[Any](s"max_$c")))).toMap
      }
    val colStats = prof.map { r =>
      val c = r.getAs[String]("column_name")
      val strLen = Option(r.getAs[String]("top_value"))
        .map(_.length.toLong).getOrElse(8L)
      val isNum = mm.contains(c)
      c -> CatalogColumnStat(
        distinctCount = Some(BigInt(r.getAs[Long]("n_distinct"))),
        min = mm.get(c).map(_._1),
        max = mm.get(c).map(_._2),
        nullCount = Some(BigInt(r.getAs[Long]("n_nulls"))),
        avgLen = Some(if (isNum) 8L else strLen),
        maxLen = Some(if (isNum) 8L else strLen),
        histogram =
          if (isNum && withHistograms) equiHeightHistogram(df, c) else None)
    }.toMap
    // totalSize stays the relation's current (file-listing) size; the CBO
    // needs it alongside numRows to cost scans.
    val sizeInBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    spark.sessionState.catalog.alterTableStats(TableIdentifier(table),
      Some(CatalogStatistics(sizeInBytes, Some(BigInt(nRows)), colStats)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_profile" -> ((s, d) => skewProfile(Tables.events(s, d))),
    "column_profile" -> ((s, d) => columnProfile(Tables.orders(s, d))),
  )

  /** Per-column profile block for the DuckDB oracle. */
  private def profileColSql(c: String): String =
    s"""SELECT '$c' AS column_name,
       |  (SELECT count(*) FROM orders)::BIGINT AS n_rows,
       |  (SELECT count(*) FROM orders WHERE $c IS NULL)::BIGINT AS n_nulls,
       |  (SELECT count(*) FROM h_$c)::BIGINT AS n_distinct,
       |  (SELECT (1000 * sum(cnt * (len(printf('%b',
       |      (SELECT sum(cnt)::BIGINT FROM h_$c) // cnt)) - 1))) //
       |      (SELECT sum(cnt)::BIGINT FROM h_$c)
       |   FROM h_$c)::BIGINT AS entropy_millibits,
       |  (SELECT v FROM h_$c ORDER BY cnt DESC, v LIMIT 1) AS top_value,
       |  (SELECT cnt FROM h_$c ORDER BY cnt DESC, v LIMIT 1)::BIGINT
       |    AS top_cnt""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "column_profile" -> {
      val hists = ProfileColumns.map(c =>
        s"""h_$c AS (
           |  SELECT $c::VARCHAR AS v, count(*)::BIGINT AS cnt
           |  FROM orders WHERE $c IS NOT NULL GROUP BY 1
           |)""".stripMargin).mkString(",\n")
      s"""WITH $hists
         |SELECT * FROM (
         |${ProfileColumns.map(profileColSql).mkString("\nUNION ALL\n")}
         |) ORDER BY column_name""".stripMargin
    },
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
