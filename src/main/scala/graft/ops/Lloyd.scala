package graft.ops

/** Driver-side exact-integer Lloyd iterations over a BOUNDED training
  * sample — the shared engine behind [[Similarity.kmeansCentroids]] and
  * [[Quantize.pqCodebooksQ]].
  *
  * Both trainers cap their sample at ~maxTrain (512) vectors via a
  * distributed md5-mod filter, so the training set is O(1) in the corpus
  * size at ANY scale — which makes the iteration loop driver-side work by
  * construction (a few hundred KB), while the corpus-scale stages
  * (assignment/encode/search) stay distributed. Running the rounds here
  * instead of as per-iteration Spark jobs removes 3-4 serial job barriers
  * per training (each was a full collect round-trip over a ≤512-row
  * frame: join + 2 aggregations + driver re-broadcast).
  *
  * EXACTNESS CONTRACT (the reason results are bit-identical to the
  * DataFrame recursion this replaces, and to the DuckDB oracle unroll):
  *   - inputs are the SQL-quantized `floor(1e4·x)` integral doubles,
  *     collected — never re-quantized here;
  *   - distances are Σ(a−b)² in Long (every term < 2^53, exact in either
  *     representation);
  *   - assignment takes the minimum of (dist, centroid index) — iteration
  *     in ascending index order with a strict `<` reproduces the
  *     struct-min / row_number tiebreak;
  *   - update is the integer mean `sum div n`: Spark's bigint `div`
  *     truncates toward zero, exactly Long `/` (verified on negatives);
  *   - a centroid that lost all members keeps its previous position.
  */
private[graft] object Lloyd {

  /** Lowercase-hex md5 of a UTF-8 string — byte-for-byte Spark's
    * `md5(cast(x as string))`, used for seed ordering. */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** `iters` exact-integer Lloyd rounds of `seeds` over `sample`.
    * Centroid identity is the array index (ascending = the c_id
    * tiebreak order). Returns the final centroids, same positions. */
  def run(sample: Array[Array[Long]], seeds: Array[Array[Long]],
      iters: Int): Array[Array[Long]] = {
    var cents = seeds
    val k = cents.length
    for (_ <- 0 until iters if k > 0) {
      val dim = cents(0).length
      val sums = Array.ofDim[Long](k, dim)
      val counts = new Array[Long](k)
      sample.foreach { qv =>
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < k) {
          val cv = cents(c)
          var d = 0L
          var i = 0
          while (i < dim) { val t = qv(i) - cv(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c } // strict: ties keep low c
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += qv(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old // lost all members: keep position
        else sums(c).map(_ / counts(c)) // Spark `div`: truncate toward zero
      }
    }
    cents
  }
}
