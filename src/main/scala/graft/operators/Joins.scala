package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path join strategies: skew salting and bucketed co-location.
  *
  * Spark's AQE handles moderate skew (`skewJoin` splits oversized
  * partitions after the map stage), but a single pathological key —
  * the null/default key, the "unknown" domain, the one viral document —
  * can still exceed what one reducer pair can process. Salting rewrites
  * the join so the hot key's rows spread over `buckets` reducers.
  * Bucketing removes the shuffle entirely for join keys that are known
  * at write time — the 100 TB pattern for repeatedly-joined fact tables
  * (pay one shuffle at ingest, join shuffle-free forever after).
  */
object Joins {

  /** Equi-join with the left side's hot keys spread over `buckets`
    * reducers. The left (large, possibly skewed) side gets a
    * deterministic salt from its full row content; the right side is
    * replicated once per salt value, so every (key, salt) reducer holds
    * the complete right match set for the key and the result is exactly
    * the plain join. Use when one side is too big to broadcast AND a few
    * keys dominate; replication costs |right| × buckets, so keep
    * `buckets` small (8-32) and the right side the smaller input.
    *
    * Deterministic: the salt is a pure function of row content (not
    * `rand()`), so retried tasks and re-runs produce identical
    * assignments — required for exactly-once sinks downstream.
    * `inner` and `left` join types preserve plain-join semantics (each
    * left row carries exactly one salt; its full match set lives at that
    * salt). Right/full-outer would need a right-side dedup pass, so they
    * are rejected.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 1, s"salting needs >1 bucket, got $buckets")
    require(Set("inner", "left", "left_outer")(joinType),
      s"salted join preserves semantics only for inner/left joins, got $joinType")
    ColumnGuards.requireNoReserved(left, "saltedJoin", Set("__salt"))
    ColumnGuards.requireNoReserved(right, "saltedJoin", Set("__salt"))
    // salt by ROW CONTENT, not a per-row counter: a counter
    // (monotonically_increasing_id) round-robins exact-duplicate piles
    // better, but it is NONDETERMINISTIC under partial stage retry — a
    // fetch failure recomputes some map tasks with different salt
    // assignments, and a reducer that already consumed attempt 0's
    // output next to one re-fetching attempt 1's can double-read or drop
    // the rows whose salt moved (the join RESULT is salt-independent;
    // the delivered multiset under retry is not, and Spark's
    // indeterminate-stage rollback does not cover DataFrame expressions).
    // The residual caveat: EXACT-duplicate rows hash to one bucket —
    // if the hot key is a pile of identical facts, pre-aggregate the
    // duplicates (count column) before joining; determinism is the
    // contract exactly-once sinks need and content hashing is the only
    // salt that survives retries.
    // xxhash64 rejects MapType at analysis (map ordering is undefined, so
    // Spark keeps spark.sql.legacy.allowHashOnMapType=false); salting from
    // the hashable columns only keeps map-carrying frames working — the
    // salt needs determinism and spread, not every byte of the row
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltColNames = left.schema.fields.filter(f => hashable(f.dataType)).map(_.name)
    require(saltColNames.nonEmpty,
      "saltedJoin: every left column contains a MapType (unhashable) — " +
        "project a hashable salt source column first")
    // a salt derived only from the join keys is CONSTANT per key: every
    // hot-key row lands in one bucket and the mitigation is silently
    // undone (the map-heavy-frame shape hits this when the keys are the
    // only hashable columns left) — refuse, mirroring the
    // byte-identical-rows caveat above
    require(!saltColNames.toSet.subsetOf(keys.toSet),
      "saltedJoin: the only hashable left columns are the join keys " +
        s"themselves (${saltColNames.mkString(", ")}) — the salt would be " +
        "key-determined and every hot-key row would land in one bucket; " +
        "project a hashable non-key salt source column first")
    val saltCols = saltColNames.map(col)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(buckets.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Point-in-interval join without a cartesian product. Spark has no
    * range-join optimization: a bare `l.ts BETWEEN r.lo AND r.hi`
    * condition plans as BroadcastNestedLoopJoin (or worse, cartesian) —
    * O(|L|·|R|) at any scale. This rewrite buckets time: each point
    * lands in exactly one fixed-width bucket, each interval explodes
    * into every bucket it overlaps, and the join becomes an EQUI-join
    * on bucket id followed by the exact containment filter. Each
    * matching (point, interval) pair meets exactly once — in the
    * point's unique bucket — so no dedup pass is needed.
    *
    * Scale: shuffle keyed on (equi-keys, bucket id) — time-parallel and,
    * with `keys`, key-parallel; interval replication is
    * |interval|/bucketWidth + 1 copies, so pick bucketWidth near the
    * typical interval length. Pass the entity keys both sides share in
    * `keys` whenever the query has them (events per user, readings per
    * device): a bare time-bucket join concentrates the whole corpus's
    * time-coincident pairs, which grows quadratically with density,
    * while the keyed form stays proportional to per-key activity.
    * Point and interval columns must be timestamps. */
  def pointInIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketMicros: Long,
      keys: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketMicros > 0, s"bucket width must be positive, got $bucketMicros")
    require(maxBucketsPerInterval > 0,
      s"bucket cap must be positive, got $maxBucketsPerInterval")
    ColumnGuards.requireNoReserved(points, "pointInIntervalJoin", Set("__bucket"))
    ColumnGuards.requireNoReserved(intervals, "pointInIntervalJoin", Set("__bucket"))
    val p = points.withColumn("__bucket", floor(
      tsMicros(pointCol, "pointInIntervalJoin",
        "a NULL event timestamp cannot land in any interval — filter " +
          "or repair upstream") / bucketMicros))
    val iv = bucketedByInterval(intervals, startCol, endCol, bucketMicros,
      maxBucketsPerInterval, "pointInIntervalJoin")
    p.join(iv, keys :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Event-time micros of a bound column, NULL-guarded: a null point or
    * interval bound would derive a null bucket, and null buckets vanish
    * from the equi-join / explode with NO error — the silent-drop shape
    * an open-ended (end = NULL) session window hits in practice. The
    * error carries a per-column `hint` naming the actual failure class
    * (a NULL POINT timestamp is bad event data, not an open-ended
    * interval — the interval-oriented diagnostic would mislead the
    * operator reading it). The cast accepts TIMESTAMP and TIMESTAMP_NTZ
    * alike (parquet scans yield NTZ); it is lossless under the engine's
    * fixed UTC session timezone. */
  private def tsMicros(c: String, op: String, hint: String): Column =
    unix_micros(ColumnGuards.requireNonNull(col(c),
      s"$op: NULL $c — $hint").cast("timestamp"))

  /** The shared bucket-explode stage of both range-join rewrites. Two
    * data errors the rewrite would otherwise ABSORB fail loudly:
    *  - an inverted interval (end < start, on RAW event time — a
    *    bucket-index comparison would let a same-bucket inversion
    *    through, where the overlap variant could then EMIT pairs for a
    *    mathematically empty interval): Spark's `sequence` silently
    *    DESCENDS when start > stop, so the bug would never surface;
    *  - a sentinel/open-ended interval (end = 9999-12-31 at a 1-day
    *    bucket ≈ 2.9M replicas) would turn one input row into a
    *    multi-million-row hot partition; the cap names the row instead.
    *    Raise it deliberately for genuinely long intervals. */
  private def bucketedByInterval(df: DataFrame, startCol: String,
      endCol: String, bucketMicros: Long, maxBucketsPerInterval: Long,
      op: String): DataFrame = {
    val startUs = tsMicros(startCol, op,
      "an interval bound must be concrete; for an open-ended interval " +
        "use an explicit horizon")
    val endUs = tsMicros(endCol, op,
      "an open-ended interval? use an explicit horizon")
    val startB = floor(startUs / bucketMicros)
    val endB = floor(endUs / bucketMicros)
    val guardedEnd = when(endUs < startUs, raise_error(concat(
        lit(s"$op: interval end before start ("),
        col(startCol).cast("string"), lit(" > "), col(endCol).cast("string"),
        lit(")"))))
      .when(endB - startB >= maxBucketsPerInterval, raise_error(concat(
        lit(s"$op: interval ["), col(startCol).cast("string"),
        lit(", "), col(endCol).cast("string"),
        lit(s"] spans more than $maxBucketsPerInterval buckets — a " +
          "sentinel end date? widen bucketMicros or raise " +
          "maxBucketsPerInterval deliberately"))))
      .otherwise(endB)
    df.withColumn("__bucket", explode(sequence(startB, guardedEnd)))
  }

  /** Interval-interval OVERLAP join without a cartesian — the sibling of
    * [[pointInIntervalJoin]] for two interval-valued sides (session vs
    * promo windows, order vs delivery spans). A bare
    * `aStart <= bEnd AND bStart <= aEnd` condition plans as
    * BroadcastNestedLoopJoin / cartesian, O(|A|·|B|). The rewrite
    * buckets time on both sides: each interval explodes into every
    * fixed-width bucket it overlaps, the join becomes an EQUI-join on
    * bucket id (plus caller keys), and the exact overlap filter runs on
    * the equi-matched pairs. Overlapping intervals share EVERY bucket
    * between max(starts) and min(ends), so the dedup rule keeps each
    * pair exactly once — in the bucket holding max(aStart, bStart),
    * which both sides provably explode into. Inclusive bounds on both
    * ends, matching the point variant.
    *
    * Same fail-loud guards as the point variant, on BOTH sides:
    * inverted intervals raise (Spark's `sequence` would silently
    * descend), and an interval spanning more than
    * `maxBucketsPerInterval` buckets raises with the row named (a
    * sentinel end date would otherwise explode one row into millions of
    * replicas). Non-key column names must not collide across the two
    * sides — rename before joining (a self-join aliases its columns
    * anyway). */
  def intervalOverlapJoin(
      left: DataFrame,
      lStartCol: String,
      lEndCol: String,
      right: DataFrame,
      rStartCol: String,
      rEndCol: String,
      bucketMicros: Long,
      keys: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketMicros > 0, s"bucket width must be positive, got $bucketMicros")
    require(maxBucketsPerInterval > 0,
      s"bucket cap must be positive, got $maxBucketsPerInterval")
    val dup = (left.columns.toSet & right.columns.toSet) -- keys
    require(dup.isEmpty,
      s"intervalOverlapJoin: non-key columns collide across sides — " +
        s"rename first: ${dup.toSeq.sorted.mkString(", ")}")
    ColumnGuards.requireNoReserved(left, "intervalOverlapJoin", Set("__bucket"))
    ColumnGuards.requireNoReserved(right, "intervalOverlapJoin", Set("__bucket"))
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))
    bucketedByInterval(left, lStartCol, lEndCol, bucketMicros,
        maxBucketsPerInterval, "intervalOverlapJoin")
      .join(bucketedByInterval(right, rStartCol, rEndCol, bucketMicros,
        maxBucketsPerInterval, "intervalOverlapJoin"), keys :+ "__bucket")
      .filter(
        col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol) &&
          // meet-once: only the bucket holding max(starts) keeps the pair
          col("__bucket") === floor(
            greatest(micros(lStartCol), micros(rStartCol)) / bucketMicros))
      .drop("__bucket")
  }

  /** Write `df` as a bucketed+sorted table so later equi-joins on
    * `bucketKeys` read co-located partitions and skip the shuffle (and
    * with matching sort, the merge phase reads pre-sorted buckets).
    * This is the ingest-time trade: one shuffle now, zero per-query
    * shuffles after — the standard layout for 100 TB fact tables that
    * join on the same key in every query. Bucket metadata lives in the
    * session catalog (works with Spark's in-memory catalog; no Hive
    * needed). */
  def materializeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      bucketKeys: Seq[String]): Unit = {
    require(bucketKeys.nonEmpty, "at least one bucket key")
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two tables previously written by [[materializeBucketed]] with
    * the same bucket count and keys. The plan contains no shuffle
    * exchange on either side — verified by spec. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
