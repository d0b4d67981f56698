package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The stateful-stream sizing rule: commit overhead bounds from above,
  * cores bound from above, state memory bounds from below. */
class StreamSizingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("stream-sizing-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        graft.TempDirs.reclaimOnExit(Files.createTempDirectory("graft-warehouse")).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  import StreamSizing.statePartitions

  test("small key space on a big machine sizes SMALL — commit cost dominates") {
    // the events_stream_attrib constants: ~1.5k user keys, 32 cores → 8
    // (NOT 32, and emphatically not the inherited default 200)
    assert(statePartitions(keyCardinality = 1500, totalCores = 32) == 8)
    // even fewer keys: a single partition is correct — every extra one
    // is a store commit with no work behind it
    assert(statePartitions(keyCardinality = 150, totalCores = 32) == 1)
    // never more partitions than keys
    assert(statePartitions(keyCardinality = 3, totalCores = 32) <= 3)
    assert(statePartitions(keyCardinality = 1, totalCores = 32) == 1)
  }

  test("large key space saturates the cores, then memory takes over") {
    // plenty of keys: bounded by cores
    assert(statePartitions(keyCardinality = 1000000, totalCores = 32) == 32)
    // state too big for core-count partitions: the memory floor wins and
    // MAY exceed cores (tasks queue; memory is the hard constraint)
    val p = statePartitions(keyCardinality = 1000000000L, totalCores = 512,
      bytesPerKey = 256L, maxPartitionStateBytes = 256L << 20)
    assert(p > 512)
    assert(p == 954) // ceil(1e9 * 256 / 256MiB)
    // extreme cardinality × width must not overflow
    val huge = statePartitions(keyCardinality = Long.MaxValue / 2,
      totalCores = 1024, bytesPerKey = 4096L)
    assert(huge > 0)
  }

  test("monotone: more keys never sizes smaller; more cores never sizes smaller") {
    val grid = Seq(1L, 10L, 1000L, 100000L, 10000000L)
    for (Seq(a, b) <- grid.sliding(2); cores <- Seq(4, 32, 512)) {
      assert(statePartitions(a, cores) <= statePartitions(b, cores))
    }
    for (k <- grid; Seq(c1, c2) <- Seq(4, 32, 512).sliding(2)) {
      assert(statePartitions(k, c1) <= statePartitions(k, c2))
    }
  }

  test("degenerate inputs are refused loudly") {
    intercept[IllegalArgumentException](statePartitions(0, 32))
    intercept[IllegalArgumentException](statePartitions(100, 0))
    intercept[IllegalArgumentException](statePartitions(100, 32, minKeysPerPartition = 0))
    intercept[IllegalArgumentException](StreamSizing.sessionFor(spark, 0))
  }

  test("sessionFor pins the count on a CLONE — the caller's session is untouched") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val ss = StreamSizing.sessionFor(spark, 8)
    assert(ss.conf.get("spark.sql.shuffle.partitions") == "8")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    assert(ss ne spark)
  }
}
