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

  test("time-traveled gavro scan via spark.sql equals the connector read") {
    Tables.events(spark, sf).createOrReplaceTempView("events")
    try {
      val viaSql = spark.sql(SparkEntry.oracleSql("gavro_asof_scan")
          .replace("::BIGINT", "")).collect()
      val viaConnector = SparkEntry.queries("gavro_asof_scan")(spark, sf).collect()
      assert(viaSql.map(_.toSeq).toSeq == viaConnector.map(_.toSeq).toSeq)
    } finally spark.catalog.dropTempView("events")
  }

  test("conversion funnel via spark.sql equals the DataFrame builder") {
    Tables.events(spark, sf).createOrReplaceTempView("events")
    try {
      val viaSql = spark.sql(SparkEntry.oracleSql("conversion_funnel")
          .replace("epoch_us(ts)", "unix_micros(ts)")
          .replace("//", "div")
          .replace("0::BIGINT", "0L")
          .replace("::BIGINT", "")).collect()
      val viaDf = SparkEntry.queries("conversion_funnel")(spark, sf).collect()
      assert(viaSql.map(_.toSeq).toSeq == viaDf.map(_.toSeq).toSeq)
    } finally spark.catalog.dropTempView("events")
  }

  test("prefix jaccard join via spark.sql equals the DataFrame builder") {
    Tables.documents(spark, sf).createOrReplaceTempView("documents")
    try {
      // Spark-ANSI spelling of the DuckDB oracle: list ops → HOFs.
      val b = graft.ops.Dedup
      val viaSql = spark.sql(
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 10000, substring(text, instr(text, ' ') + 1)
           |  FROM documents WHERE doc_id % 25 = 0
           |), toks AS (
           |  SELECT doc_id, explode(array_distinct(split(text, ' '))) AS tok
           |  FROM corpus
           |), dfreq AS (
           |  SELECT tok, count(*) AS df FROM toks GROUP BY tok
           |), ranked AS (
           |  SELECT t.doc_id, t.tok,
           |    row_number() OVER (PARTITION BY t.doc_id ORDER BY df, t.tok) AS rnk,
           |    count(*) OVER (PARTITION BY t.doc_id) AS n
           |  FROM toks t JOIN dfreq USING (tok)
           |), prefix AS (
           |  SELECT doc_id, tok, n FROM ranked
           |  WHERE rnk <= n - ((${b.JacNum} * n + ${b.JacNum}) div ${b.JacDen}) + 1
           |), capped AS (
           |  SELECT doc_id, tok, n FROM (
           |    SELECT *, count(*) OVER (PARTITION BY tok) AS bucket_n FROM prefix)
           |  WHERE bucket_n <= ${b.MaxBucketSize}
           |), cands AS (
           |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           |    x.n AS n_a, y.n AS n_b
           |  FROM capped x JOIN capped y
           |    ON x.tok = y.tok AND x.doc_id < y.doc_id
           |), inter AS (
           |  SELECT doc_a, doc_b, n_a, n_b, count(*) AS inter_n
           |  FROM cands
           |  JOIN toks ta ON doc_a = ta.doc_id
           |  JOIN toks tb ON doc_b = tb.doc_id AND ta.tok = tb.tok
           |  GROUP BY doc_a, doc_b, n_a, n_b
           |)
           |SELECT doc_a, doc_b, CAST(inter_n AS BIGINT) AS inter_n,
           |  CAST(n_a + n_b - inter_n AS BIGINT) AS union_n
           |FROM inter
           |WHERE ${b.JacDen} * inter_n >= ${b.JacNum} * (n_a + n_b - inter_n)
           |ORDER BY doc_a, doc_b""".stripMargin).collect()
      val viaDf = SparkEntry.queries("dedup_jaccard_prefix")(spark, sf).collect()
      assert(viaSql.map(_.toSeq).toSeq == viaDf.map(_.toSeq).toSeq)
    } finally spark.catalog.dropTempView("documents")
  }
}
