package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product quantization (PQ) for embedding compression + ANN search — the
  * fine-grained half of a production vector index (IVF in [[Similarity]]
  * partitions the corpus; PQ compresses what's inside the partitions).
  *
  * A 64-dim float vector (256 B) becomes [[M]] one-byte codes (8 B, 32×):
  * the vector is split into M contiguous subvectors, each quantized to its
  * nearest centroid in a per-subspace codebook of [[K]] entries trained by
  * deterministic L2 Lloyd iterations. Search uses the standard asymmetric
  * distance computation (ADC): per query, a broadcast M×K lookup table of
  * exact subvector→centroid distances; a corpus vector's approximate
  * distance is the sum of M table lookups over its codes — the full-precision
  * corpus is never touched after encoding.
  *
  * Scale shape mirrors the IVF trainer: Lloyd runs on a capped md5-sample;
  * assignment/encoding is one broadcast-join pass over the corpus (all M
  * subspaces trained and encoded in ONE exploded frame, not M passes); the
  * only driver traffic is the M·K·(dim/M) codebook per iteration. ADC
  * search shuffles only (q_id, vec_id, partial-distance) triples.
  *
  * Determinism: seeds are the K smallest md5(vec_id) picks; centroid means
  * are left folds over sorted member values (one canonical float sum
  * order); argmin ties break on centroid id via struct-min. Iterative
  * float training cannot be mirrored in one-shot SQL, so queries register
  * rows-only; QuantizeSpec pins determinism, code-width, reconstruction
  * monotonicity, and recall against the exact baseline.
  */
object Quantize {

  val M = 8 // subspaces
  val K = 16 // codebook entries per subspace
  val Dim = 64
  private val SubDim = Dim / M
  private val NumQueries = 5
  private val TopK = 5

  private def d2(a: String, b: String): String =
    s"vec_dot($a, $a) - 2 * vec_dot($a, $b) + vec_dot($b, $b)"

  /** One row per (vec_id, sub_idx): the sub_idx-th length-[[SubDim]] slice
    * of the (exactly float→double cast) vector. */
  private def subvecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      posexplode(expr(
        s"transform(sequence(0, ${M - 1}), m -> slice(cast(v as array<double>), m * $SubDim + 1, $SubDim))")))
      .toDF("vec_id", "sub_idx", "sv")

  /** Per-subspace codebooks: (sub_idx, c_id, cv) after `iters` deterministic
    * L2 Lloyd rounds over a capped md5-sample of the corpus. */
  def pqCodebooks(emb: DataFrame, iters: Int = 3, maxTrain: Int = 512): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val n = emb.count()
    val every = math.max(1L, (n + maxTrain - 1) / maxTrain)
    val sample = subvecs(
      if (every == 1L) emb
      else emb.filter(expr(
        s"conv(substring(md5(cast(vec_id as string)), 1, 15), 16, 10) % $every = 0")))
      .persist()
    // Seeds: the K hash-smallest sampled vectors seed EVERY subspace with
    // their respective subvectors (one global pick, no per-subspace window).
    // The collected rows arrive in md5 order, so rank = position.
    val seedRank = sample.select(col("vec_id")).distinct()
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h")).limit(K)
      .collect().map(_.getAs[Long]("vec_id")).zipWithIndex.toMap
    var books: Seq[(Int, Int, Vector[Double])] = sample
      .filter(col("vec_id").isin(seedRank.keys.toSeq: _*)).collect()
      .map(r => (r.getAs[Int]("sub_idx"),
        seedRank(r.getAs[Long]("vec_id")),
        r.getSeq[Double](r.fieldIndex("sv")).toVector))
      .toSeq.sortBy(t => (t._1, t._2))
    for (_ <- 0 until iters) {
      val cdf = books.toDF("sub_idx", "c_id", "cv")
      val assigned = assign(sample, cdf)
      val updated = assigned
        .select(col("sub_idx"), col("c_id"), posexplode(col("sv")))
        .toDF("sub_idx", "c_id", "pos", "x")
        .groupBy(col("sub_idx"), col("c_id"), col("pos"))
        .agg(expr("aggregate(array_sort(collect_list(x)), 0D, (a, b) -> a + b) / count(x)")
          .as("m"))
        .groupBy(col("sub_idx"), col("c_id"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cv"))
        .collect()
        .map(r => (r.getAs[Int]("sub_idx"), r.getAs[Int]("c_id")) ->
          r.getSeq[Double](r.fieldIndex("cv")).toVector)
        .toMap
      books = books.map { case (s, c, old) => (s, c, updated.getOrElse((s, c), old)) }
    }
    sample.unpersist()
    books.toDF("sub_idx", "c_id", "cv")
  }

  /** Nearest codebook entry per (vec_id, sub_idx): broadcast the M·K
    * codebook, argmin squared L2 with c_id tiebreak via struct-min. `sv`
    * is constant within each group, so `first` is value-deterministic. */
  private def assign(sub: DataFrame, cdf: DataFrame): DataFrame =
    sub.join(broadcast(cdf), "sub_idx")
      .select(col("vec_id"), col("sub_idx"), col("sv"),
        struct(expr(d2("sv", "cv")).as("d"), col("c_id")).as("sc"))
      .groupBy(col("vec_id"), col("sub_idx"))
      .agg(min(col("sc")).as("best"), first(col("sv")).as("sv"))
      .select(col("vec_id"), col("sub_idx"), col("sv"), col("best.c_id").as("c_id"))

  /** PQ codes: (vec_id, codes array<int> ordered by sub_idx) — M bytes of
    * index payload per vector at cluster scale. */
  def pqEncode(emb: DataFrame, codebooks: DataFrame): DataFrame =
    assign(subvecs(emb), codebooks)
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(sub_idx, c_id))), s -> s.c_id)")
        .as("codes"))

  /** Audit helper: total squared quantization error of `emb` under
    * `codebooks` (driver-summed in sorted order — a scalar diagnostic, not
    * a pipeline stage). Lloyd training must not increase this. */
  def quantizationError(emb: DataFrame, codebooks: DataFrame): Double =
    assign(subvecs(emb), codebooks)
      .join(broadcast(codebooks), Seq("sub_idx", "c_id"))
      .select(expr(d2("sv", "cv")).as("e"))
      .collect().map(_.getAs[Double]("e")).sorted.sum

  /** ADC top-k: queries keep full precision; the corpus is searched purely
    * through its codes against a broadcast per-query distance LUT. */
  def annPqTopK(embeddings: DataFrame): DataFrame = {
    val emb = embeddings.select(col("vec_id"), col("embedding").as("v")).persist()
    val books = pqCodebooks(emb)
    val codes = pqEncode(emb, books)
      .select(col("vec_id"), posexplode(col("codes"))).toDF("vec_id", "sub_idx", "c_id")
    val lut = subvecs(emb.filter(col("vec_id") < NumQueries))
      .select(col("vec_id").as("q_id"), col("sub_idx"), col("sv"))
      .join(broadcast(books), "sub_idx")
      .select(col("q_id"), col("sub_idx"), col("c_id"), expr(d2("sv", "cv")).as("pd"))
    val scored = codes
      .join(broadcast(lut), Seq("sub_idx", "c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(expr("aggregate(array_sort(collect_list(pd)), 0D, (a, b) -> a + b)").as("adist"))
    val out = graft.plans.TopK.topKPerGroup(
        scored, Seq("q_id"), Seq("adist" -> true, "vec_id" -> true), TopK)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("adist").asc, col("vec_id").asc)).cast("long"))
      .select(col("q_id"), col("rnk"), col("vec_id"))
      .orderBy(col("q_id"), col("rnk"))
    out
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_pq_topk" -> ((s, d) => annPqTopK(Tables.embeddings(s, d))),
  )

  def oracleSql: Map[String, String] = Map.empty
}
