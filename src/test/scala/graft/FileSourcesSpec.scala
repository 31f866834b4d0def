package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.sources.Tables

/** S11: CSV/JSON batch sources round-trip with explicit schemas. */
class FileSourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv source reads with explicit schema and header") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part.csv"),
      "id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    val df = Tables.csv(spark, dir, schema)
    assert(df.schema == schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha")
    assert(rows(1).getDouble(2) == 2.5)
  }

  test("json source reads json-lines with explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part.json"),
      """{"id":1,"name":"alpha","score":1.5}
        |{"id":2,"name":"beta","score":2.5}
        |""".stripMargin)
    val df = Tables.json(spark, dir, schema)
    assert(df.schema == schema)
    assert(df.count() == 2)
    assert(df.orderBy("id").collect()(1).getString(1) == "beta")
  }
}
