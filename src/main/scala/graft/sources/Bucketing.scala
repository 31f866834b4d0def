package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers — the co-located-join technique for repeated
  * large-scale joins on a stable key: both sides pre-hashed into the same
  * bucket layout at write time, so joins on the bucket key plan with NO
  * shuffle exchange (verified by plan assertion in BucketingSpec).
  *
  * At 100 TB this is how the fact tables would be laid out for the
  * recurring user_id / order_id joins; the shuffle happens once at ingest
  * instead of once per query.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
