package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

object TextStats {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
