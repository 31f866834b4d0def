package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Determinism and ORACLE-EXACTNESS: every arithmetic step happens in
  * quantized integer space — components enter training as `floor(1e4·x)`
  * (exact on the bit-identical float→double cast), distances are the
  * integer identity q·q − 2q·c + c·c (≤ 8·(2e4)² ≈ 3.2e9 per subspace,
  * well inside 2^53 even through the double-typed vec_dot path), and
  * centroid updates are integer means (`sum div n`, order-free). Seeds are
  * the K smallest md5(vec_id) picks; argmin ties break on centroid id.
  * Because no step depends on float summation order, the whole recursion
  * — sample → seeds → 3×(argmin → integer mean) → encode → ADC — unrolls
  * into chained DuckDB CTEs ([[pqSql]]) and `ann_pq_topk` is hash-verified
  * end to end. QuantizeSpec additionally pins determinism, code-width,
  * reconstruction monotonicity, and planted-twin recall.
  */
object Quantize {

  val M = 8 // subspaces
  val K = 16 // codebook entries per subspace
  val Dim = 64
  private val SubDim = Dim / M
  private val NumQueries = 5
  private val TopK = 5

  /** Quantization scale shared with [[Similarity]]'s trained quantizers:
    * `floor(1e4·x)` is exact on bit-identical doubles and keeps every
    * distance term integer-exact. */
  private val QScale = 10000

  /** Exact integer squared-L2 via the dot identity — three codegen'd
    * vec_dot calls over integral-double arrays, no interpreted lambda. */
  private def d2(a: String, b: String): Column =
    (expr(s"vec_dot($a, $a)") - lit(2.0) * expr(s"vec_dot($a, $b)") +
      expr(s"vec_dot($b, $b)")).cast("long")

  /** One row per (vec_id, sub_idx): the sub_idx-th length-[[SubDim]] slice
    * of the QUANTIZED vector (`floor(1e4·x)` as integral doubles). */
  private def subvecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      posexplode(expr(
        s"transform(sequence(0, ${M - 1}), m -> slice(" +
          s"cast(transform(cast(v as array<double>), x -> floor($QScale * x)) " +
          s"as array<double>), m * $SubDim + 1, $SubDim))")))
      .toDF("vec_id", "sub_idx", "sv")

  /** Per-subspace codebooks: (sub_idx, c_id, cv) after `iters` integer-L2
    * Lloyd rounds over a capped md5-sample of the corpus; cv is an
    * integral array<double> at [[QScale]]. */
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
    // The collected rows arrive in md5 order, so rank = position (0-based).
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
      // Integer mean per (subspace, centroid, component): `sum div n` is
      // order-free — the step that makes the recursion oracle-mirrorable.
      val updated = assigned
        .select(col("sub_idx"), col("c_id"), posexplode(col("sv")))
        .toDF("sub_idx", "c_id", "pos", "x")
        .groupBy(col("sub_idx"), col("c_id"), col("pos"))
        .agg(expr("cast(sum(cast(x as bigint)) div count(1) as double)").as("m"))
        .groupBy(col("sub_idx"), col("c_id"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cv"))
        .collect()
        .map(r => (r.getAs[Int]("sub_idx"), r.getAs[Int]("c_id")) ->
          r.getSeq[Double](r.fieldIndex("cv")).toVector)
        .toMap
      // A centroid that lost all members keeps its previous position.
      books = books.map { case (s, c, old) => (s, c, updated.getOrElse((s, c), old)) }
    }
    sample.unpersist()
    books.toDF("sub_idx", "c_id", "cv")
  }

  /** Nearest codebook entry per (vec_id, sub_idx): broadcast the M·K
    * codebook, integer-L2 argmin with c_id tiebreak via struct-min. `sv`
    * is constant within each group, so `first` is value-deterministic. */
  private def assign(sub: DataFrame, cdf: DataFrame): DataFrame =
    sub.join(broadcast(cdf), "sub_idx")
      .select(col("vec_id"), col("sub_idx"), col("sv"),
        struct(d2("sv", "cv").as("d"), col("c_id")).as("sc"))
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

  /** Audit helper: total squared quantization error (in QScale² units) of
    * `emb` under `codebooks` — an exact integer sum, so plain `sum` is
    * deterministic. Lloyd training must not increase this. */
  def quantizationError(emb: DataFrame, codebooks: DataFrame): Double =
    assign(subvecs(emb), codebooks)
      .join(broadcast(codebooks), Seq("sub_idx", "c_id"))
      .select(d2("sv", "cv").as("e"))
      .agg(sum(col("e"))).head.getLong(0).toDouble

  /** ADC top-k: queries keep full precision; the corpus is searched purely
    * through its codes against a broadcast per-query distance LUT. Every
    * distance is an exact integer, so the ranking hash-matches the oracle. */
  def annPqTopK(embeddings: DataFrame): DataFrame = {
    val emb = embeddings.select(col("vec_id"), col("embedding").as("v")).persist()
    val books = pqCodebooks(emb)
    val codes = pqEncode(emb, books)
      .select(col("vec_id"), posexplode(col("codes"))).toDF("vec_id", "sub_idx", "c_id")
    val lut = subvecs(emb.filter(col("vec_id") < NumQueries))
      .select(col("vec_id").as("q_id"), col("sub_idx"), col("sv"))
      .join(broadcast(books), "sub_idx")
      .select(col("q_id"), col("sub_idx"), col("c_id"), d2("sv", "cv").as("pd"))
    val scored = codes
      .join(broadcast(lut), Seq("sub_idx", "c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pd")).as("adist"))
    graft.plans.TopK.topKPerGroup(
        scored, Seq("q_id"), Seq("adist" -> true, "vec_id" -> true), TopK)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("adist").asc, col("vec_id").asc)).cast("long"))
      .select(col("q_id"), col("rnk"), col("vec_id"))
      .orderBy(col("q_id"), col("rnk"))
  }

  // ------------------------------------------------------------------ oracle

  private def d2Sql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${SubDim + 1}), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"

  /** The PQ recursion unrolled as DuckDB CTEs: quantize → md5-sample →
    * subspace explode → hash seeds → 3×(argmin → integer mean with
    * lost-centroid carry) → encode all → per-query LUT → ADC sum → rank.
    * Mirrors [[Similarity]]'s kmeansSql technique per subspace. */
  private def pqSql: String = {
    val rounds = (1 to 3).map { r =>
      val prev = s"c${r - 1}"
      s"""a$r AS (
         |  SELECT vec_id, sub_idx, sv, c_id FROM (
         |    SELECT s.vec_id, s.sub_idx, s.sv, c.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id, s.sub_idx
         |        ORDER BY ${d2Sql("s.sv", "c.cv")} ASC, c.c_id ASC) AS crnk
         |    FROM sub s JOIN $prev c USING (sub_idx)) WHERE crnk = 1
         |), u$r AS (
         |  SELECT sub_idx, c_id, d, sum(sv[d]) // count(*) AS m
         |  FROM a$r, range(1, ${SubDim + 1}) r(d) GROUP BY sub_idx, c_id, d
         |), n$r AS (
         |  SELECT sub_idx, c_id, list(m ORDER BY d) AS cv
         |  FROM u$r GROUP BY sub_idx, c_id
         |), c$r AS (
         |  SELECT p.sub_idx, p.c_id, coalesce(nu.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN n$r nu
         |    ON nu.sub_idx = p.sub_idx AND nu.c_id = p.c_id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH src AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |qt AS (
       |  SELECT vec_id, list_transform(v, x -> floor($QScale * x)::BIGINT) AS qv
       |  FROM src
       |), ev AS (
       |  SELECT greatest(1, (count(*) + ${512 - 1}) // 512)::BIGINT AS every FROM qt
       |), samp AS (
       |  SELECT vec_id, qv FROM qt, ev
       |  WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT % every = 0
       |), sub AS (
       |  SELECT vec_id, m::INT AS sub_idx,
       |    list_slice(qv, m * $SubDim + 1, m * $SubDim + $SubDim) AS sv
       |  FROM samp, range(0, $M) r(m)
       |), allsub AS (
       |  SELECT vec_id, m::INT AS sub_idx,
       |    list_slice(qv, m * $SubDim + 1, m * $SubDim + $SubDim) AS sv
       |  FROM qt, range(0, $M) r(m)
       |), seedids AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT vec_id,
       |      (row_number() OVER (ORDER BY md5(vec_id::VARCHAR)) - 1)::INT AS c_id
       |    FROM samp) WHERE c_id < $K
       |), c0 AS (
       |  SELECT s.sub_idx, sd.c_id, s.sv AS cv
       |  FROM sub s JOIN seedids sd USING (vec_id)
       |),
       |$rounds,
       |codes AS (
       |  SELECT vec_id, sub_idx, c_id FROM (
       |    SELECT s.vec_id, s.sub_idx, c.c_id,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub_idx
       |        ORDER BY ${d2Sql("s.sv", "c.cv")} ASC, c.c_id ASC) AS crnk
       |    FROM allsub s JOIN c3 c USING (sub_idx)) WHERE crnk = 1
       |), lut AS (
       |  SELECT q.vec_id AS q_id, q.sub_idx, c.c_id,
       |    ${d2Sql("q.sv", "c.cv")} AS pd
       |  FROM allsub q JOIN c3 c USING (sub_idx) WHERE q.vec_id < $NumQueries
       |), scored AS (
       |  SELECT l.q_id, k.vec_id, sum(l.pd) AS adist
       |  FROM codes k JOIN lut l USING (sub_idx, c_id)
       |  WHERE k.vec_id <> l.q_id
       |  GROUP BY l.q_id, k.vec_id
       |), ranked AS (
       |  SELECT q_id, vec_id, (row_number() OVER (PARTITION BY q_id
       |    ORDER BY adist ASC, vec_id ASC))::BIGINT AS rnk
       |  FROM scored
       |)
       |SELECT q_id, rnk, vec_id FROM ranked WHERE rnk <= $TopK
       |ORDER BY q_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_pq_topk" -> ((s, d) => annPqTopK(Tables.embeddings(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "ann_pq_topk" -> pqSql,
  )
}
