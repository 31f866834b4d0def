package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared parallelism helpers for batch operators.
  *
  * [[fan]]: round-robin a frame over the session's cores before a
  * CPU-heavy map pass. Every fixture table is ONE small parquet file
  * (single row group), so scans plan 1-2 tasks no matter what
  * `maxPartitionBytes` says, and per-row map work (wire codecs, md5
  * shingle explodes, BPE merge chains) serializes on a couple of the 32
  * cores — profiled at sf0.1, guide §1.2/§2.5. Cores-adaptive
  * (`defaultParallelism`), not a constant: at 100 TB the scan fans out on
  * its own and the extra narrow exchange is one pass of the raw rows.
  * Use ONLY where the map work measurably dominates the exchange — the
  * batch-1 A/B showed a 1.66× REGRESSION applying it to a light codec —
  * and never on streaming micro-batch paths (arrival partitioning is
  * part of their latency budget).
  */
private[graft] object Par {
  def fan(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
