package graft

import graft.sources.Tables

/** The `spark.sql` surface: the engine's tables registered as temp views
  * and queried with ANSI SQL strings must agree with the DataFrame
  * builders — a user can drive this library from SQL alone. (The SQL texts
  * are the same ANSI the DuckDB oracle runs, which is the point: one query
  * text, three engines, one answer.)
  */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def viewed[A](f: => A): A = {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sf).createOrReplaceTempView("orders")
    Tables.customer(spark, sf).createOrReplaceTempView("customer")
    try f finally Seq("lineitem", "orders", "customer")
      .foreach(spark.catalog.dropTempView(_))
  }

  test("pricing summary via spark.sql equals the DataFrame builder") {
    viewed {
      val viaSql = spark.sql(SparkEntry.oracleSql("pricing_summary")).collect()
      val viaDf = SparkEntry.queries("pricing_summary")(spark, sf).collect()
      assert(viaSql.map(_.toSeq).toSeq == viaDf.map(_.toSeq).toSeq)
    }
  }

  test("window top-k via spark.sql equals the custom physical operator") {
    viewed {
      val viaSql = spark.sql(SparkEntry.oracleSql("topk_per_group")).collect()
      val viaOp = SparkEntry.queries("topk_per_group")(spark, sf).collect()
      assert(viaSql.map(_.toSeq).toSeq == viaOp.map(_.toSeq).toSeq)
    }
  }
}
