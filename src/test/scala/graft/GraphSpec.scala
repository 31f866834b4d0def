package graft

import graft.ops.Graph

/** Fixed-point PageRank pinned against an independent in-test reference. */
class GraphSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"doc $i", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Reference: same planted edges, same integer update, plain Scala. */
  private def reference(n: Int): Map[Long, Long] = {
    val edges = (0L until n.toLong).flatMap { src =>
      Seq((src * 7 + 13) % n, (src * 31 + 5) % n).map { t =>
        src -> (if (t == src) (t + 1) % n else t)
      }
    }
    var ranks = (0L until n.toLong).map(_ -> Graph.RankScale).toMap
    for (_ <- 1 to Graph.Rounds) {
      val contribs = edges.groupBy(_._2).map { case (tgt, es) =>
        tgt -> es.map { case (src, _) => 85L * ranks(src) / 200L }.sum
      }
      ranks = (0L until n.toLong)
        .map(v => v -> (Graph.RankScale * 15 / 100 + contribs.getOrElse(v, 0L))).toMap
    }
    ranks
  }

  test("link rank on a 2-regular symmetric graph stays at the uniform fixed point") {
    // n=3: every node has in-degree 2, so 150000 + 2*(85*1e6/200) = 1e6
    // round after round — the uniform distribution is stationary.
    val out = Graph.linkRank(docs(3)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank")).toMap
    assert(out == Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L))
  }

  test("link rank matches the independent integer reference on a skewed graph") {
    // n=5 plants parallel edges and in-degree skew (node 3 has 3 in-edges,
    // node 2 only 1); the distributed result must equal the single-threaded
    // reference bit-for-bit because all arithmetic is integer.
    val out = Graph.linkRank(docs(5)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank")).toMap
    val ref = reference(5)
    assert(out == ref)
    assert(ref(3L) > ref(2L)) // the skew is real: more in-mass, higher rank
  }

  /** Independent BFS reference over the same planted edges. */
  private def bfsReference(n: Int): Map[(Long, Long), Long] = {
    val edges = (0L until n.toLong).flatMap { src =>
      Seq((src * 7 + 13) % n, (src * 31 + 5) % n).map { t =>
        src -> (if (t == src) (t + 1) % n else t)
      }
    }
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val indeg = edges.groupBy(_._2).map { case (t, es) => t -> es.size.toLong }
    val seeds = (0L until n.toLong)
      .sortBy(v => (-indeg.getOrElse(v, 0L), v)).take(Graph.ReachSeeds)
    seeds.flatMap { seed =>
      var visited = Map(seed -> 0L)
      var frontier = Set(seed)
      for (h <- 1 to Graph.ReachHops) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .diff(visited.keySet)
        visited ++= next.map(_ -> h.toLong)
        frontier = next
      }
      visited.groupBy(_._2).map { case (hop, m) =>
        (seed, hop) -> m.size.toLong
      }
    }.toMap
  }

  test("k-hop reach matches the independent BFS reference") {
    val out = Graph.khopReach(docs(20)).collect()
      .map(r => (r.getAs[Long]("seed"), r.getAs[Long]("hop")) ->
        r.getAs[Long]("n_nodes")).toMap
    assert(out == bfsReference(20))
    // Every seed reports its own hop-0 row.
    assert(out.count { case ((_, hop), n) => hop == 0L && n == 1L } ==
      Graph.ReachSeeds)
  }

  test("co-purchase similarity keeps only pairs above the co-occurrence floor") {
    import spark.implicits._
    // A,B co-occur in 3 orders (kept); every other pair co-occurs once
    // (below CoocMin=2, dropped). deg(A)=deg(B)=3 → cos² = 9/9 = 1.
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 30L), (4L, 40L))
      .toDF("l_orderkey", "l_partkey")
    val out = Graph.copurchaseSimilar(li)
      .select("part", "rnk", "nbr", "cooc", "cos2_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (10L, 1L, 20L, 3L, 1000000L),
      (20L, 1L, 10L, 3L, 1000000L)))
  }

  test("triangle count finds exactly the planted triangles") {
    import spark.implicits._
    // order 1 = triangle {1,2,3}; order 2 = bridge 3-4; order 3 = K4 on
    // {4,5,6,7} (4 triangles); order 4 repeats pair {1,2} (dedup check);
    // order 5 is below the quantity gate and must not contribute.
    val rows =
      Seq((1L, 1L), (1L, 2L), (1L, 3L),
        (2L, 3L), (2L, 4L),
        (3L, 4L), (3L, 5L), (3L, 6L), (3L, 7L),
        (4L, 1L), (4L, 2L),
        (5L, 8L), (5L, 9L)).map { case (o, p) =>
        (o, p, if (o == 5L) 1.0 else 40.0)
      }.toDF("l_orderkey", "l_partkey", "l_quantity")
    val out = Graph.triangleCount(rows).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_edges") == 10L, r.toString)     // 3 + 1 + 6
    assert(r.getAs[Long]("n_triangles") == 5L, r.toString)  // 1 + C(4,3)
    // every triangle closes exactly one generated wedge, so wedges bound
    // triangles from above (equality here: orientation only forms wedges
    // at each triangle's minimum vertex and this graph has no open wedge
    // at a low-degree source)
    assert(r.getAs[Long]("n_wedges") >= r.getAs[Long]("n_triangles"))
  }
}
