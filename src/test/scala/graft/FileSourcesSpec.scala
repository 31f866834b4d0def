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

  test("binaryFile source ingests raw media, glob-pruned at listing time") {
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("a.img"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.img"), Array[Byte](9, 8))
    Files.write(dir.resolve("notes.txt"), "skip me".getBytes)
    val df = Tables.binaryFiles(spark, dir.toString, Some("*.img"))
    val rows = df.orderBy("path").collect()
    assert(rows.length == 2) // the .txt never entered the scan
    assert(rows.map(_.getAs[Long]("length")).toSeq == Seq(4L, 2L))
    assert(rows.head.getAs[Array[Byte]]("content").toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("mergeSchema unifies parquet written by successive pipeline versions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    // v1 writer: (id, text); v2 added a quality column.
    Seq((1L, "alpha")).toDF("id", "text")
      .write.mode("append").parquet(dir)
    Seq((2L, "beta", 0.9)).toDF("id", "text", "quality")
      .write.mode("append").parquet(dir)
    val df = Tables.parquetMerged(spark, dir)
    assert(df.columns.sorted.toSeq == Seq("id", "quality", "text"))
    val byId = df.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("quality"))) // v1 rows: null
    assert(byId(2L).getAs[Double]("quality") == 0.9)
  }
}
