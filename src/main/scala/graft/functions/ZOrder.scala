package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering keys built from plain `functions` columns
  * — no UDF, no custom expression: the whole key is floor/shift/and/or
  * arithmetic, so Catalyst folds it into whole-stage codegen and the
  * rewrite job that computes it per row stays on the fast path. Used by
  * [[graft.sources.Gavro.clusterTable]] to lay a table out so that a
  * range predicate on ANY of the clustered dimensions — not just the
  * leading one of a lexicographic sort — maps to a contiguous-ish block
  * set the footer's min/max stats can exclude.
  *
  * Construction (the classic bit-interleave of Morton's 1966 ordering,
  * the layout Delta's OPTIMIZE ZORDER and parquet z-ordering use):
  *
  *  1. each column NORMALIZES against its observed [min, max] into a
  *     `2^(64/n)`-bucket grid ([[bucketOf]]). Normalization is the load-
  *     bearing step: interleaving RAW bit patterns would leave every
  *     real-world low-range column (ids, latencies, epoch days) constant
  *     in its top bits and the composite would collapse to whichever
  *     dimension happens to span its type's range. Rank (quantile)
  *     bucketing would equalize skewed columns further, but needs a
  *     per-row binary search no built-in expresses; linear scaling keeps
  *     the key pure arithmetic and is exact for ~uniform dimensions —
  *     the documented trade.
  *  2. bucket bits interleave round-robin — bit `j` of column `i` lands
  *     at position `j·n + i` — so each dimension contributes every
  *     `n`-th bit and a prefix of the composite pins a hyper-box in all
  *     dimensions at once;
  *  3. the sign bit flips so SIGNED long comparison (what Spark's sort
  *     and range partitioner use) equals unsigned comparison of the
  *     interleave.
  *
  * Generalizes [[graft.sources.Bucketing.zorderKey]] — the 2-D,
  * 16-bit-grid key behind the PARQUET z-layout writer
  * (`Bucketing.writeZOrdered`, oracle-pinned bit-for-bit by the
  * `zorder_key` query) — to n ≤ 4 dimensions, `64/n`-bit grids,
  * type-aware canonicalization (timestamp/date), and a composite that
  * compares correctly as a plain signed long; this form feeds
  * [[graft.sources.Gavro.clusterTable]]'s TRANSACTIONAL rewrite where
  * the parquet form writes a fresh layout. Same interleave convention
  * (column 0 on the even bits).
  *
  * NULL buckets at 0, clustering with the minimum — sound, because the
  * key orders LAYOUT only, never query semantics. Strings and doubles
  * are rejected: a string has no fixed-width order-preserving numeric
  * image expressible in codegen'd arithmetic, and IEEE doubles need
  * raw-bit access Spark exposes no function for — both cluster fine
  * under the linear (lexicographic) strategy, and point probes on them
  * are the bloom filter's job.
  */
object ZOrder {

  /** Interleaving more than 4 dimensions gives each ≤ 16 bits of grid —
    * past that the per-dimension resolution is too coarse to buy
    * skipping, the same reason practical z-order guidance caps the
    * column list. */
  val MaxCols: Int = 4

  /** The order-preserving numeric image the grid normalizes over;
    * long→double rounding past 2^53 can only merge adjacent buckets,
    * never reorder them. */
  def toDouble(c: Column, dt: DataType): Column = dt match {
    case LongType | IntegerType | ShortType | ByteType => c.cast(DoubleType)
    case TimestampType | TimestampNTZType => unix_micros(c).cast(DoubleType)
    case DateType => unix_date(c).cast(DoubleType)
    case other => throw new IllegalArgumentException(
      s"zorder: unsupported type ${other.simpleString} — integral, " +
        "timestamp and date columns only (strings/doubles cluster " +
        "linearly; point probes on them are bloom territory)")
  }

  /** Driver-side twin of [[toDouble]] for a COLLECTED min/max value
    * (what a pushdown-friendly `agg(min(col), max(col))` returns); None
    * for null (an all-null column has no range and buckets constant). */
  def boundOf(v: Any, dt: DataType): Option[Double] = Option(v).map { x =>
    (dt, x) match {
      case (TimestampType, t: java.sql.Timestamp) => t.getTime * 1000.0
      case (TimestampType | TimestampNTZType, t: java.time.LocalDateTime) =>
        t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000.0
      case (TimestampType, t: java.time.Instant) => t.toEpochMilli * 1000.0
      case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toDouble
      case (DateType, d: java.time.LocalDate) => d.toEpochDay.toDouble
      case (_, n: Number) => n.doubleValue
      case other => throw new IllegalArgumentException(
        s"zorder: cannot derive a bound from $other")
    }
  }

  /** One dimension's grid cell in `[0, 2^k)`: linear position of the
    * value inside `[lo, hi]`, clamped (values outside the observed
    * bounds — impossible for same-snapshot bounds, safe anyway), null
    * → cell 0. Degenerate bounds (constant or all-null column) pin the
    * whole dimension to cell 0 — it simply stops contributing bits. */
  def bucketOf(c: Column, dt: DataType, lo: Double, hi: Double,
      k: Int): Column = {
    val cells = (1L << k) - 1
    if (!(hi > lo)) return lit(0L)
    val scaled = floor(
      (toDouble(c, dt) - lit(lo)) / lit(hi - lo) * lit(cells.toDouble))
    coalesce(least(greatest(scaled, lit(0L)), lit(cells)), lit(0L))
  }

  /** The composite Z key as one signed-comparable LongType column:
    * `cols` are (column, datatype) pairs, `bounds` their observed
    * (min, max) in [[toDouble]]'s domain. A single column degenerates to
    * its own grid position (= plain linear clustering on it). */
  def zvalue(cols: Seq[(Column, DataType)],
      bounds: Seq[(Double, Double)]): Column = {
    require(cols.nonEmpty, "zorder: at least one column")
    require(cols.size <= MaxCols,
      s"zorder: at most $MaxCols columns (got ${cols.size}) — more " +
        "dimensions dilute per-dimension resolution below usefulness")
    require(bounds.length == cols.length,
      "zorder: one (min, max) bound pair per column")
    val n = cols.size
    val k = if (n == 1) 63 else 64 / n
    val cells = cols.zip(bounds).map { case ((c, dt), (lo, hi)) =>
      bucketOf(c, dt, lo, hi, k)
    }
    val unsignedZ =
      if (n == 1) cells.head
      else cells.zipWithIndex.map { case (cell, i) =>
        (0 until k).map { j =>
          shiftleft(shiftrightunsigned(cell, j).bitwiseAND(lit(1L)), j * n + i)
        }.reduce(_ bitwiseOR _)
      }.reduce(_ bitwiseOR _)
    unsignedZ.bitwiseXOR(lit(Long.MinValue))
  }
}
