package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.tools.SpecErrors.messageText
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew join and bucketed co-located join: semantics equal the
  * plain join; the bucketed plan contains no shuffle exchange. */
class JoinsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("joins-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        graft.TempDirs.reclaimOnExit(Files.createTempDirectory("graft-warehouse")).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Skewed fixture: key 0 holds half the left rows. */
  private def skewed() = {
    val sp = spark; import sp.implicits._
    val left = ((1 to 500).map(i => (0L, s"hot$i")) ++
      (1 to 500).map(i => (i.toLong % 50 + 1, s"cold$i"))).toDF("k", "lv")
    val right = (0L to 50L).map(k => (k, s"dim$k")).toDF("k", "rv")
    (left, right)
  }

  test("salted join: inner equals plain inner join, including duplicates") {
    val (left, right) = skewed()
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "lv", "rv").collect().map(_.toSeq).toSeq.sorted(RowOrd)
    val salted = Joins.saltedJoin(left, right, Seq("k"), buckets = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSeq.sorted(RowOrd)
    assert(salted == plain)
    assert(plain.size == 1000)
  }

  test("salted join: distinct-content hot rows spread across buckets (content-hash salt)") {
    val sp = spark; import sp.implicits._
    // 1000 DISTINCT payloads under one hot key: the content-hash salt
    // must spread them (the documented caveat is the inverse case —
    // byte-identical rows share a bucket; pre-aggregate those)
    val left = (0 until 1000).map(i => ("hot", i.toLong)).toDF("k", "lv")
    val salted = left.withColumn("__salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("k"),
            org.apache.spark.sql.functions.col("lv")),
          org.apache.spark.sql.functions.lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(salted > 1) // the operator's salt rule, pinned structurally
    // and the join result stays exactly the plain join's
    val right = Seq(("hot", "r")).toDF("k", "rv")
    val out = Joins.saltedJoin(left, right, Seq("k"), buckets = 8)
    assert(out.count() == 1000)
  }

  test("salted join: map columns are skipped by the salt, all-map left fails loudly") {
    val sp = spark; import sp.implicits._
    // xxhash64 rejects MapType at analysis — the salt must come from the
    // hashable columns only, or any map-carrying frame dies
    val left = (0 until 100).map(i => ("hot", i.toLong, Map("m" -> i))).toDF("k", "lv", "mv")
    val right = Seq(("hot", "r")).toDF("k", "rv")
    val out = Joins.saltedJoin(left, right, Seq("k"), buckets = 8)
    assert(out.count() == 100)
    assert(out.columns.toSet == Set("k", "lv", "mv", "rv"))
    // a left side with NO hashable column cannot be salted — named error,
    // not an opaque analysis exception
    val allMap = (0 until 4).map(i => Map("k" -> i)).toDF("mv")
      .withColumn("k", org.apache.spark.sql.functions.lit("hot")).select("mv")
    val e = intercept[IllegalArgumentException] {
      Joins.saltedJoin(allMap, allMap, Seq("mv"), buckets = 4)
    }
    assert(e.getMessage.contains("MapType"))
  }

  test("salted join: key-determined salt (hashable columns ⊆ keys) fails loudly") {
    val sp = spark; import sp.implicits._
    // the only hashable left column IS the join key (payload is a map):
    // the salt would be constant per key, silently undoing the skew
    // mitigation — refused with the failure named
    val left = (0 until 10).map(i => ("hot", Map("m" -> i))).toDF("k", "mv")
    val right = Seq(("hot", "r")).toDF("k", "rv")
    val e = intercept[IllegalArgumentException] {
      Joins.saltedJoin(left, right, Seq("k"), buckets = 4)
    }
    assert(e.getMessage.contains("key-determined"))
  }

  test("interval join: NULL point timestamp raises the point-specific diagnostic") {
    val sp = spark; import sp.implicits._
    val points = Seq((1L, Some(0L)), (2L, None))
      .toDF("id", "p_us")
      .select(col("id"), timestamp_micros(col("p_us")).as("p"))
    val ivs = Seq((1L, 0L, 3600L * 1000000L)).toDF("iv_id", "lo_us", "hi_us")
      .select(col("iv_id"),
        timestamp_micros(col("lo_us")).as("lo"),
        timestamp_micros(col("hi_us")).as("hi"))
    val e = intercept[Exception] {
      Joins.pointInIntervalJoin(points, ivs, "p", "lo", "hi",
        bucketMicros = 3600L * 1000000L).collect()
    }
    // the error names the POINT failure class, not the interval-horizon
    // advice that used to mislead here
    assert(messageText(e).contains("NULL event timestamp"))
    assert(!messageText(e).contains("open-ended"))
  }

  test("salted join: left join keeps unmatched left rows exactly once") {
    val sp = spark; import sp.implicits._
    val (left, right) = skewed()
    val withOrphan = left.unionByName(Seq((999L, "orphan")).toDF("k", "lv"))
    val plain = withOrphan.join(right, Seq("k"), "left")
      .select("k", "lv", "rv").collect().map(_.toSeq).toSeq.sorted(RowOrd)
    val salted = Joins.saltedJoin(withOrphan, right, Seq("k"), buckets = 8, joinType = "left")
      .select("k", "lv", "rv").collect().map(_.toSeq).toSeq.sorted(RowOrd)
    assert(salted == plain)
    assert(salted.count(_.head == 999L) == 1)
  }

  test("salted join: rejects right/full outer (would duplicate unmatched right rows)") {
    val (left, right) = skewed()
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(left, right, Seq("k"), buckets = 8, joinType = "right")
    }
  }

  test("interval join: equals the naive range join; boundaries inclusive; pairs meet once") {
    val sp = spark; import sp.implicits._
    val H = 3600L * 1000000L // one hour in micros
    // points every 10 minutes over a day; intervals of assorted widths,
    // including one spanning many buckets and zero-width boundary cases
    val points = (0L until 144L).map(i => Tuple1(i * 10 * 60 * 1000000L))
      .toDF("p_us").select(timestamp_micros(col("p_us")).as("p"))
    val ivs = Seq(
      (1L, 0L, 30 * 60 * 1000000L),             // half-hour from epoch
      (2L, 2 * H, 2 * H),                        // zero-width: exactly one point
      (3L, 5 * H + 1, 9 * H - 1),                // open-ish interior
      (4L, 0L, 23 * H)                           // spans many buckets
    ).toDF("iv_id", "lo_us", "hi_us")
      .select(col("iv_id"),
        timestamp_micros(col("lo_us")).as("lo"),
        timestamp_micros(col("hi_us")).as("hi"))
    val got = Joins.pointInIntervalJoin(points, ivs, "p", "lo", "hi",
        bucketMicros = 2 * H)
      .select(col("iv_id"), col("p")).as[(Long, java.sql.Timestamp)]
      .collect().toVector.sorted(Ordering.by((t: (Long, java.sql.Timestamp)) => (t._1, t._2.getTime)))
    val naive = points.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("iv_id"), col("p")).as[(Long, java.sql.Timestamp)]
      .collect().toVector.sorted(Ordering.by((t: (Long, java.sql.Timestamp)) => (t._1, t._2.getTime)))
    assert(got == naive, "bucketed result must equal the naive range join")
    // no dedup pass exists, so pair multiplicity must already be 1
    assert(got.distinct == got, "each (interval, point) pair meets exactly once")
    // zero-width interval matched exactly its boundary point (inclusivity)
    assert(got.count(_._1 == 2L) == 1)
  }

  test("interval join property: random keyed corpus equals naive join at several bucket widths") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(42)
    val H = 3600L * 1000000L
    val points = (1 to 300).map { i =>
      (i.toLong % 5, rnd.nextLong(48 * H))
    }.toDF("k", "p_us")
      .select(col("k"), timestamp_micros(col("p_us")).as("p"))
    val ivs = (1 to 80).map { i =>
      val lo = rnd.nextLong(48 * H)
      (i.toLong, i.toLong % 5, lo, lo + rnd.nextLong(6 * H))
    }.toDF("iv_id", "k", "lo_us", "hi_us")
      .select(col("iv_id"), col("k"),
        timestamp_micros(col("lo_us")).as("lo"),
        timestamp_micros(col("hi_us")).as("hi"))
    val naive = points.join(ivs, Seq("k"))
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("iv_id"), col("p")).as[(Long, java.sql.Timestamp)]
      .collect().sortBy(t => (t._1, t._2.getTime)).toVector
    for (bucket <- Seq(H / 2, H, 7 * H)) {
      val got = Joins.pointInIntervalJoin(points, ivs, "p", "lo", "hi",
          bucketMicros = bucket, keys = Seq("k"))
        .select(col("iv_id"), col("p")).as[(Long, java.sql.Timestamp)]
        .collect().sortBy(t => (t._1, t._2.getTime)).toVector
      assert(got == naive, s"bucket width $bucket diverges from the naive join")
    }
  }

  test("overlap join: equals the naive overlap join; pairs meet once; guards fire") {
    val sp = spark; import sp.implicits._
    val H = 3600L * 1000000L
    val rnd = new scala.util.Random(7)
    def ivs(prefix: String, n: Int) = (1 to n).map { i =>
      val lo = rnd.nextLong(48 * H)
      (i.toLong, i.toLong % 4, lo, lo + rnd.nextLong(8 * H))
    }.toDF(s"${prefix}_id", "k", s"${prefix}_lo_us", s"${prefix}_hi_us")
      .select(col(s"${prefix}_id"), col("k"),
        timestamp_micros(col(s"${prefix}_lo_us")).as(s"${prefix}_lo"),
        timestamp_micros(col(s"${prefix}_hi_us")).as(s"${prefix}_hi"))
    val a = ivs("a", 80)
    val b = ivs("b", 60)
    val naive = a.join(b, Seq("k"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select(col("a_id"), col("b_id")).as[(Long, Long)]
      .collect().sorted.toVector
    for (bucket <- Seq(H / 2, 2 * H, 12 * H)) {
      val got = Joins.intervalOverlapJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
          bucketMicros = bucket, keys = Seq("k"))
        .select(col("a_id"), col("b_id")).as[(Long, Long)]
        .collect().sorted.toVector
      assert(got == naive, s"bucket width $bucket diverges from the naive join")
      assert(got.distinct == got, "each pair meets exactly once (no dedup pass exists)")
    }
    // zero-width touching intervals: [t, t] overlaps [t, t+1h] (inclusive)
    val za = Seq((1L, 0L, 2 * H, 2 * H)).toDF("a_id", "k", "lo_us", "hi_us")
      .select(col("a_id"), col("k"),
        timestamp_micros(col("lo_us")).as("a_lo"),
        timestamp_micros(col("hi_us")).as("a_hi"))
    val zb = Seq((9L, 0L, 2 * H, 3 * H)).toDF("b_id", "k", "lo_us", "hi_us")
      .select(col("b_id"), col("k"),
        timestamp_micros(col("lo_us")).as("b_lo"),
        timestamp_micros(col("hi_us")).as("b_hi"))
    assert(Joins.intervalOverlapJoin(za, "a_lo", "a_hi", zb, "b_lo", "b_hi",
      bucketMicros = H, keys = Seq("k")).count() == 1)
    // inverted interval on the RIGHT side fails loudly too
    val inv = Seq((9L, 0L, 3 * H, 2 * H)).toDF("b_id", "k", "lo_us", "hi_us")
      .select(col("b_id"), col("k"),
        timestamp_micros(col("lo_us")).as("b_lo"),
        timestamp_micros(col("hi_us")).as("b_hi"))
    val e = intercept[Exception] {
      Joins.intervalOverlapJoin(za, "a_lo", "a_hi", inv, "b_lo", "b_hi",
        bucketMicros = H, keys = Seq("k")).collect()
    }
    assert(messageText(e).contains("end before start"))
    // colliding non-key columns are refused up front
    val e2 = intercept[IllegalArgumentException] {
      Joins.intervalOverlapJoin(a, "a_lo", "a_hi", a, "a_lo", "a_hi",
        bucketMicros = H, keys = Seq("k"))
    }
    assert(e2.getMessage.contains("rename"))
  }

  test("bucketed join: no shuffle exchange, same result as direct join") {
    val sp = spark; import sp.implicits._
    val facts = (1 to 2000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "v")
    val dims = (0L until 100L).map(k => (k, s"d$k")).toDF("k", "name")
    Joins.materializeBucketed(facts, "bkt_facts", numBuckets = 4, Seq("k"))
    Joins.materializeBucketed(dims, "bkt_dims", numBuckets = 4, Seq("k"))
    // force the sort-merge path so the assertion is about bucketing, not
    // a broadcast that hides the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Joins.bucketedJoin(spark, "bkt_facts", "bkt_dims", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      val expect = facts.join(dims, Seq("k")).count()
      assert(joined.count() == expect)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  /** Deterministic ordering for row-seq comparison. */
  private object RowOrd extends Ordering[Seq[Any]] {
    def compare(a: Seq[Any], b: Seq[Any]): Int =
      a.map(String.valueOf).mkString("|").compareTo(b.map(String.valueOf).mkString("|"))
  }
}
