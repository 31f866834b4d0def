package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Two-level geo region resolution as a real broadcast dim-join chain:
  * city-level override mapping first, country-level fallback second,
  * 'Unknown' default last.
  *
  * reference: init-scripts/postgres/seed-postgres.sql:108-175 (the
  * `city_region_mapping` / `country_region_mapping` seed tables) and
  * DESCRIPTION.md:871-893 (resolution order). The mapping tables are tiny
  * config dims — at 100 TB they are *the* canonical broadcast-join case:
  * both lookups ship with every task and the event stream is never
  * shuffled for enrichment.
  *
  * The events fixture has no geo columns, so country/city are derived from
  * `user_id` with deterministic formulas both engines compute identically
  * (same approach as [[Synth]]). The derivation deliberately produces all
  * three outcomes: city-override hits (US/CA cities, including Vancouver
  * where the city region differs from the country fallback), country
  * fallback hits (GB/JP/SG/AU/BR/IN/ZA), and defaults (US cities absent
  * from the city map — the US has no country-level row, exactly like the
  * reference seed — plus the unmapped 'XX' code).
  */
object RegionLookup {

  /** country_code → (region, lon, lat); reference seed-postgres.sql:136-161. */
  val countryRows: Seq[(String, String, Double, Double)] = Seq(
    ("CA", "North America (East)", -74d, 40d),
    ("GB", "Western Europe", 2d, 48d),
    ("FR", "Western Europe", 2d, 48d),
    ("DE", "Western Europe", 2d, 48d),
    ("JP", "Japan", 139d, 35d),
    ("SG", "Southeast Asia", 103d, 1d),
    ("AU", "Australia", 151d, -33d),
    ("BR", "Brazil", -46d, -23d),
    ("IN", "India", 77d, 28d),
    ("ZA", "South Africa", 18d, -33d))

  /** (country_code, city_pattern) → (region, lon, lat); seed-postgres.sql:163-177. */
  val cityRows: Seq[(String, String, String, Double, Double)] = Seq(
    ("US", "New York", "North America (East)", -74d, 40d),
    ("US", "Boston", "North America (East)", -74d, 40d),
    ("US", "Chicago", "North America (East)", -74d, 40d),
    ("US", "Los Angeles", "North America (West)", -122d, 37d),
    ("US", "San Francisco", "North America (West)", -122d, 37d),
    ("US", "Seattle", "North America (West)", -122d, 37d),
    ("CA", "Toronto", "North America (East)", -74d, 40d),
    ("CA", "Vancouver", "North America (West)", -122d, 37d))

  /** Deterministic country/city derivation (cross-engine: plain modulo). */
  val countries: Seq[String] =
    Seq("US", "CA", "GB", "JP", "SG", "AU", "BR", "IN", "ZA", "XX")
  val cities: Seq[String] =
    Seq("New York", "Boston", "Chicago", "Los Angeles", "San Francisco",
      "Seattle", "Toronto", "Vancouver", "Springfield")

  def countryDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    countryRows.toDF("cc_ctry", "ctry_region", "ctry_lon", "ctry_lat")
  }

  def cityDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    cityRows.toDF("cc_city", "city_pattern", "city_region", "city_lon", "city_lat")
  }

  /** Per-region rollup after the two-level lookup; the per-event resolved
    * frame is the pre-agg intermediate.
    */
  /** Per-event resolution — the enrichment frame itself. Broadcast-only
    * (no stream shuffle, no join state), so it applies unchanged to a
    * STREAMING events frame ([[graft.streaming.StreamJoins.enrichedEvents]]).
    */
  def resolvedEvents(spark: SparkSession, events: DataFrame): DataFrame = {
    val derived = events.select(
      col("event_id"), col("user_id"),
      element_at(array(countries.map(lit): _*),
        (pmod(col("user_id"), lit(countries.size)) + 1).cast("int")).as("country_code"),
      element_at(array(cities.map(lit): _*),
        (pmod(col("user_id"), lit(cities.size)) + 1).cast("int")).as("city"))
    derived
      .join(broadcast(cityDim(spark)),
        col("country_code") === col("cc_city") && col("city") === col("city_pattern"),
        "left")
      .join(broadcast(countryDim(spark)),
        col("country_code") === col("cc_ctry"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("city_region"), col("ctry_region"), lit("Unknown")).as("region_name"),
        when(col("city_region").isNotNull, lit("city"))
          .when(col("ctry_region").isNotNull, lit("country"))
          .otherwise(lit("default")).as("src"),
        coalesce(col("city_lon"), col("ctry_lon")).as("lon"),
        coalesce(col("city_lat"), col("ctry_lat")).as("lat"))
  }

  def regionLookup(spark: SparkSession, events: DataFrame): DataFrame = {
    val resolved = resolvedEvents(spark, events)
    resolved.groupBy(col("region_name"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("src") === "city", 1L).otherwise(0L)).as("city_hits"),
        sum(when(col("src") === "country", 1L).otherwise(0L)).as("country_hits"),
        min(col("lon")).as("longitude"),
        min(col("lat")).as("latitude"))
      .orderBy(col("region_name"))
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region_lookup" -> ((s, d) => regionLookup(s, Tables.events(s, d))))

  private def valuesSql[A](rows: Seq[A], render: A => String): String =
    rows.map(render).mkString(",\n    ")

  def oracleSql: Map[String, String] = Map(
    "region_lookup" -> {
      val ctry = valuesSql[(String, String, Double, Double)](countryRows,
        r => s"('${r._1}', '${r._2}', ${r._3}, ${r._4})")
      val city = valuesSql[(String, String, String, Double, Double)](cityRows,
        r => s"('${r._1}', '${r._2.replace("'", "''")}', '${r._3}', ${r._4}, ${r._5})")
      val ctries = countries.map(c => s"'$c'").mkString("[", ", ", "]")
      val cits = cities.map(c => s"'$c'").mkString("[", ", ", "]")
      s"""WITH country_map AS (
         |  SELECT country_code, region_name, longitude::DOUBLE AS longitude,
         |    latitude::DOUBLE AS latitude
         |  FROM (VALUES
         |    $ctry) t(country_code, region_name, longitude, latitude)
         |), city_map AS (
         |  SELECT country_code, city_pattern, region_name,
         |    longitude::DOUBLE AS longitude, latitude::DOUBLE AS latitude
         |  FROM (VALUES
         |    $city) t(country_code, city_pattern, region_name, longitude, latitude)
         |), e AS (
         |  SELECT event_id, user_id,
         |    ($ctries)[user_id % ${countries.size} + 1] AS country_code,
         |    ($cits)[user_id % ${cities.size} + 1] AS city
         |  FROM events
         |), r AS (
         |  SELECT e.user_id,
         |    coalesce(cm.region_name, km.region_name, 'Unknown') AS region_name,
         |    CASE WHEN cm.region_name IS NOT NULL THEN 'city'
         |         WHEN km.region_name IS NOT NULL THEN 'country'
         |         ELSE 'default' END AS src,
         |    coalesce(cm.longitude, km.longitude) AS lon,
         |    coalesce(cm.latitude, km.latitude) AS lat
         |  FROM e
         |  LEFT JOIN city_map cm
         |    ON cm.country_code = e.country_code AND cm.city_pattern = e.city
         |  LEFT JOIN country_map km ON km.country_code = e.country_code
         |)
         |SELECT region_name, count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users,
         |  sum(CASE WHEN src = 'city' THEN 1 ELSE 0 END)::BIGINT AS city_hits,
         |  sum(CASE WHEN src = 'country' THEN 1 ELSE 0 END)::BIGINT AS country_hits,
         |  min(lon) AS longitude, min(lat) AS latitude
         |FROM r GROUP BY region_name ORDER BY region_name""".stripMargin
    })
}
