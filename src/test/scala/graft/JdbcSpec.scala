package graft

import java.sql.DriverManager

import graft.sources.Tables

/** S8 upgraded from code-only to exercised: the JDBC batch snapshot read
  * against an embedded in-memory Derby database (the Derby jars ship with
  * Spark). Verifies both the plain one-task read and the PARTITIONED read —
  * the option set that matters at scale, where an unpartitioned JDBC scan
  * is a single task against the source database.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE users") catch { case _: Exception => () }
      st.execute("CREATE TABLE users (id BIGINT PRIMARY KEY, name VARCHAR(32), balance DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO users VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"user_$i"); ins.setDouble(3, i * 1.5)
        ins.executeUpdate()
      }
      ins.close(); st.close()
    } finally conn.close()
  }

  test("jdbc snapshot reads an embedded database, plain and partitioned") {
    seed()
    // plain read: one partition, full table
    val plain = Tables.jdbcSnapshot(spark, url, "users", "", "")
    assert(plain.count() == 100)
    assert(plain.rdd.getNumPartitions == 1) // the scale hazard the options fix

    // partitioned read: ranges of the partition column split across tasks
    val part = Tables.jdbcSnapshot(spark, url, "users", "", "",
      partitionColumn = Some("id"), numPartitions = 4, bounds = Some((1L, 100L)))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    // same rows either way, and pushed-down filtering works
    assert(part.filter("balance > 120.0").count() ==
      plain.filter("balance > 120.0").count())
    val top = part.orderBy(org.apache.spark.sql.functions.desc("id")).limit(1).collect()
    assert(top.head.getAs[String]("NAME") == "user_100") // Derby uppercases identifiers
  }
}
