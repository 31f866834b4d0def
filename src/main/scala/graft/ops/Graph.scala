package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative graph analytics over a planted link graph on the `documents`
  * fixture — the PageRank-style importance propagation a crawl-derived
  * training corpus uses for source weighting (quality-weighted sampling by
  * link authority, the original signal behind "high-quality web" subsets).
  *
  * The fixture has no edge table, so a deterministic 2-regular link graph
  * is planted by integer arithmetic on dense doc_ids (both engines replay
  * it exactly); a real deployment swaps in its crawl edge table and the
  * plan shape is unchanged.
  *
  * All rank arithmetic is FIXED-POINT: ranks live in integer micro-units
  * and every per-edge contribution is an integer division, so the result
  * is bit-exact on any engine and any partitioning — no float summation
  * order to diverge. Each round is one shuffle join (edges x ranks on src)
  * plus one aggregation (sum by tgt): the classic iterative-Spark shape,
  * same as [[Dedup]]'s connected-components rounds. At production round
  * counts the loop needs per-round `localCheckpoint` lineage truncation
  * exactly as `Dedup.clusterAssignments` does; at the fixed 3 rounds here
  * the lineage stays shallow enough to skip it.
  */
object Graph {

  /** Damping numerator/denominator: rank flows 85/100 through edges, 15/100
    * restarts uniformly — the standard PageRank damping as exact integers. */
  val Rounds = 3
  val RankScale = 1000000L

  /** Fixed-point PageRank over the planted graph: every doc links to
    * `(7*id+13) mod n` and `(31*id+5) mod n` (self-loops displaced by one),
    * giving out-degree exactly 2. Per-round update:
    * `rank'(v) = 150000 + sum over in-edges u of (85 * rank(u)) div 200`.
    */
  def linkRank(documents: DataFrame): DataFrame = {
    val n = documents.agg(count(lit(1)).as("n"))
    val withN = documents.select(col("doc_id")).crossJoin(broadcast(n))
    val edges = withN
      .select(col("doc_id").as("src"),
        explode(array(pmod(col("doc_id") * 7 + 13, col("n")),
          pmod(col("doc_id") * 31 + 5, col("n")))).as("t"),
        col("n"))
      .select(col("src"),
        when(col("t") === col("src"), pmod(col("t") + 1, col("n")))
          .otherwise(col("t")).as("tgt"))
      // materialize once: every round joins this table, and without the
      // checkpoint each round re-plans the scan + edge generation (3 corpus
      // scans for 3 rounds); eager localCheckpoint also truncates lineage,
      // the same treatment Dedup's connected-components rounds use
      .localCheckpoint(true)
    val nodes = documents.select(col("doc_id").as("node"))
    var ranks = nodes.select(col("node"), lit(RankScale).as("rank"))
    for (_ <- 1 to Rounds) {
      val contribs = edges.join(ranks, col("src") === col("node"))
        .select(col("tgt"), expr("(85 * rank) div 200").as("c"))
        .groupBy(col("tgt")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.join(contribs, col("node") === col("tgt"), "left")
        .select(col("node"),
          (lit(RankScale * 15 / 100) + coalesce(col("contrib"), lit(0L))).as("rank"))
    }
    ranks.orderBy(col("node"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "link_rank" -> ((s, d) => linkRank(Tables.documents(s, d))),
  )

  /** Oracle: the same three rounds unrolled as chained CTEs — integer
    * arithmetic end to end, so equality is exact, not a tolerance check. */
  def oracleSql: Map[String, String] = {
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT n.node, ${RankScale * 15 / 100} + coalesce(s.contrib, 0) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.tgt AS node, sum((85 * r.rank) // 200)::BIGINT AS contrib
         |    FROM edges e JOIN $prev r ON r.node = e.src GROUP BY e.tgt
         |  ) s ON s.node = n.node
         |)""".stripMargin
    Map(
      "link_rank" ->
        s"""WITH params AS (SELECT count(*)::BIGINT AS n FROM documents),
           |nodes AS (SELECT doc_id AS node FROM documents),
           |e0 AS (
           |  SELECT doc_id AS src, (doc_id * 7 + 13) % n AS t FROM documents, params
           |  UNION ALL
           |  SELECT doc_id, (doc_id * 31 + 5) % n FROM documents, params
           |),
           |edges AS (
           |  SELECT src, CASE WHEN t = src THEN (t + 1) % (SELECT n FROM params)
           |    ELSE t END AS tgt
           |  FROM e0
           |),
           |r0 AS (SELECT node, $RankScale::BIGINT AS rank FROM nodes),
           |${round("r0", "r1")},
           |${round("r1", "r2")},
           |${round("r2", "r3")}
           |SELECT node, rank FROM r3 ORDER BY node""".stripMargin,
    )
  }
}
