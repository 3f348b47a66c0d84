package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Explicit hash-spread before a COMPUTE-dense per-row pass (bulk
  * MinHash/SimHash signatures, PQ encoding): scan splits are sized by
  * BYTES (`spark.sql.files.maxPartitionBytes`, then parquet row-group
  * granularity — a single-row-group file cannot split at all, and the
  * gate fixtures are exactly that), so a CPU-dominated map over a
  * small-bytes frame serializes onto one or two cores no matter how many
  * the session has. One id-keyed exchange of the raw rows buys full
  * parallelism for the pass (r15; measured: dedup_ngram ran its entire
  * 96-hash signature pass on 1 of 32 cores — 11 jobs, 11 tasks, 4.1 s).
  *
  * Applied ONLY where the per-row pass is measured compute-bound
  * (dedup_ngram's char-8 × 96-hash signatures 1.2×, dedup_simhash_md5's
  * per-token md5 2.4×, simHashNearDups 1.2×) — NOT blanket at operator
  * entries: the same exchange measured 0.8× on word-shingle MinHash, on
  * parameter-light PQ encodes, and inside the job-count-bound streaming
  * door batches, where one more exchange job costs more than the
  * parallelism buys. The same imbalance exists at cluster scale (a zstd
  * text column decompresses and hashes at 50-200× its stored bytes) and
  * the exchange is input-sized — the cheapest class of shuffle (§2.3).
  * The target partition count is the session's own shuffle parallelism —
  * the knob deployments already size to data (guide §1.2, §2.5, §6).
  * Hash-partitioning by the row id is deterministic and result-invisible
  * (every consumer downstream is order-independent).
  */
private[graft] object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(n, key)
  }
}
