package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic synthetic dimensions layered over the driver's `events`
  * fixture so the reference's fat-event columns (region_name, platform,
  * city, country_code, display name — reference:
  * src/streaming/schemas.py:92-112, seeded by scripts/generate_test_data.py)
  * exist to exercise the same expressions. Everything here is a pure column
  * formula over (event_id, user_id), reproducible verbatim in DuckDB SQL, so
  * oracle results hash-match.
  */
object Synth {

  /** The 9 fixed regions (reference: src/streaming/config.py:112-122). */
  val regionNames: Seq[String] = Seq(
    "North America (East)", "North America (West)", "Western Europe",
    "Japan", "Southeast Asia", "Australia", "Brazil", "India", "South Africa")

  /** region_name, nullable 1-in-10 so coalesce-to-'Unknown' (P12) has work. */
  def regionName(userId: Column): Column =
    when(pmod(userId, lit(10)) === 0, lit(null).cast("string"))
      .otherwise(element_at(array(regionNames.map(lit): _*),
        (pmod(userId, lit(9)) + 1).cast("int")))

  /** SQL (DuckDB) text of [[regionName]] over a user_id expression. */
  def regionNameSql(userId: String): String = {
    val arr = regionNames.map(n => s"'$n'").mkString("[", ", ", "]")
    s"CASE WHEN $userId % 10 = 0 THEN NULL ELSE ($arr)[($userId % 9)::INT + 1] END"
  }

  /** platform, nullable 1-in-11 so the not-null filter (P5) has work. */
  def platform(eventId: Column, userId: Column): Column =
    when(pmod(eventId, lit(11)) === 0, lit(null).cast("string"))
      .otherwise(element_at(array(lit("ios"), lit("android"), lit("web")),
        (pmod(userId, lit(3)) + 1).cast("int")))

  def platformSql(eventId: String, userId: String): String =
    s"CASE WHEN $eventId % 11 = 0 THEN NULL ELSE (['ios','android','web'])[($userId % 3)::INT + 1] END"

  /** user_display_name, nullable 1-in-5 so the P10 fallback has work. */
  def displayName(userId: Column): Column =
    when(pmod(userId, lit(5)) === 0, lit(null).cast("string"))
      .otherwise(concat(lit("user_"), userId.cast("string")))

  def displayNameSql(userId: String): String =
    s"CASE WHEN $userId % 5 = 0 THEN NULL ELSE 'user_' || $userId::VARCHAR END"

  /** city, nullable 2-in-3 (P11 takes the concat branch only when both city
    * and country_code are present). */
  def city(eventId: Column): Column =
    when(pmod(eventId, lit(3)) === 0,
      concat(lit("city_"), pmod(eventId, lit(7)).cast("string")))
      .otherwise(lit(null).cast("string"))

  def citySql(eventId: String): String =
    s"CASE WHEN $eventId % 3 = 0 THEN 'city_' || ($eventId % 7)::VARCHAR ELSE NULL END"

  /** country_code, nullable 1-in-2. */
  def countryCode(eventId: Column): Column =
    when(pmod(eventId, lit(2)) === 0, lit("US")).otherwise(lit(null).cast("string"))

  def countryCodeSql(eventId: String): String =
    s"CASE WHEN $eventId % 2 = 0 THEN 'US' ELSE NULL END"

  /** Event-time column normalized to session-tz (UTC) TimestampType: parquet
    * timestamps load as TIMESTAMP_NTZ in Spark 4 and NTZ neither casts to
    * BIGINT nor carries a zone for epoch math. */
  def eventTime(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn(tsCol, col(tsCol).cast("timestamp"))

  /** Epoch milliseconds of a window bound (reference pattern
    * `window.end.cast("double")*1000 → long`, kpi_aggregator.py:201). */
  def epochMs(c: Column): Column = (c.cast("double") * 1000).cast("long")
}
