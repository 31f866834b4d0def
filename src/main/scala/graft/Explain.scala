package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for the named registered
  * queries (all when none named) — the 100 TB lens: check PushedFilters,
  * ReadSchema pruning, broadcast joins, and WholeStageCodegen spans.
  *
  * Usage: sbt "runMain graft.Explain [sfDir] [query ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Session.builder("graft-explain", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: unknown query ==")
        case Some(fn) =>
          println(s"\n===================== $name =====================")
          fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
