package graft.streaming

/** Sizing discipline for STATEFUL Structured Streaming queries.
  *
  * `spark.sql.shuffle.partitions` is not a tuning knob a stateful query
  * can revisit: the state partition count FREEZES into the checkpoint at
  * first start (Spark refuses to load a checkpoint under a different
  * count), and from then on EVERY micro-batch pays open + commit +
  * maintenance on every state store instance — `statePartitions ×
  * storesPerOperator` of them (a streaming aggregation runs 1 store per
  * partition, a stream-stream join runs 4: two sides × keyed/value
  * stores) — whether or not the partition holds any keys. An inherited
  * default of 200 therefore burns 800 store commits per micro-batch on a
  * join whose key space would fit in 8 partitions; the events_stream_attrib
  * gate measured exactly that shape (21.2 s → ~4 s after sizing 32 → 8
  * at ~1.5k keys).
  *
  * [[statePartitions]] encodes the decision rule those constants came
  * from, so product code sizes from its own key statistics instead of
  * copying a gate's magic number.
  */
object StreamSizing {

  /** The state partition count to set (via [[sessionFor]] or
    * `spark.sql.shuffle.partitions` on a cloned session) BEFORE a
    * stateful query's first start.
    *
    * The rule, smallest count that satisfies every bound:
    *  - **commit overhead** bounds from above: a partition below
    *    `minKeysPerPartition` keys does microseconds of work per batch
    *    but still pays a full store commit, so parallelism beyond
    *    `keyCardinality / minKeysPerPartition` makes the query SLOWER —
    *    this is the bound the default-200 deployments miss;
    *  - **cores** bound from above: beyond `totalCores` extra partitions
    *    add commits without adding concurrent work;
    *  - **state memory** bounds from below: a partition's store (HDFS-
    *    backed keeps its map in executor memory, RocksDB its working
    *    set) must hold `keyCardinality × bytesPerKey / partitions` —
    *    partitions rise until that fits `maxPartitionStateBytes`, and
    *    this floor MAY exceed the core count (tasks then queue, which is
    *    correct: memory is the hard constraint, latency the soft one);
    *  - never more partitions than keys, never fewer than 1.
    *
    * `keyCardinality` is the DISTINCT grouping/join key count the stream
    * is expected to hold in state at peak (post-watermark-eviction), not
    * the row count. Estimate it from the batch table the stream mirrors
    * (`approx_count_distinct`) or a KMV sketch; sizing from a guess one
    * order of magnitude high is safe (the cost curve is flat between the
    * commit bound and the core bound), from one order low is not (memory).
    */
  def statePartitions(
      keyCardinality: Long,
      totalCores: Int,
      minKeysPerPartition: Long = 200L,
      bytesPerKey: Long = 256L,
      maxPartitionStateBytes: Long = 256L << 20): Int = {
    require(keyCardinality > 0,
      s"statePartitions: keyCardinality must be positive, got $keyCardinality")
    require(totalCores > 0,
      s"statePartitions: totalCores must be positive, got $totalCores")
    require(minKeysPerPartition > 0 && bytesPerKey > 0 && maxPartitionStateBytes > 0,
      "statePartitions: bounds must be positive")
    val commitBound = (keyCardinality + minKeysPerPartition - 1) / minKeysPerPartition
    // BigInt: extreme cardinality × width overflows Long; the floor is
    // capped at keyCardinality (bytesPerKey never exceeds a partition's
    // budget in any sane call, but the cap keeps hostile inputs finite)
    val totalBytes = BigInt(keyCardinality) * BigInt(bytesPerKey)
    val memoryFloor =
      ((totalBytes + maxPartitionStateBytes - 1) / maxPartitionStateBytes)
        .min(BigInt(keyCardinality)).toLong
    val p = math.max(memoryFloor, math.min(totalCores.toLong, commitBound))
    math.max(1L, math.min(p, keyCardinality)).min(Int.MaxValue.toLong).toInt
  }

  /** A cloned session with `spark.sql.shuffle.partitions` pinned to `n`
    * for a stateful query's FIRST start — cloned so the sizing never
    * leaks into the caller's batch plans, and documented here so gate
    * and product code share one idiom instead of each re-deriving the
    * newSession dance. The count only matters at first start; restarts
    * read it back from the checkpoint. */
  def sessionFor(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.SparkSession = {
    require(n > 0, s"sessionFor: state partition count must be positive, got $n")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", n.toString)
    ss
  }
}
