package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the watermark-EVICTION half of the streaming contract the
  * events_stream_late gate is built on, against a tiny synthetic feed
  * where every number is checkable by hand — in particular Spark's
  * deliberate one-batch LAG between the two watermark uses (SPARK-24634
  * lineage): batch N evicts state with the watermark computed from data
  * through batch N−1, but filters LATE RECORDS with the watermark
  * recorded in batch N−1's metadata, i.e. from data through batch N−2.
  * A late file arriving immediately after the advancing file is
  * therefore ADMITTED (the gate's staging adds a bridge batch for
  * exactly this reason); one arriving a batch later is dropped. */
class WatermarkEvictionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("watermark-eviction-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        graft.TempDirs.reclaimOnExit(Files.createTempDirectory("graft-warehouse")).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** One single-file slice with rows on the given January-2024 days
    * (3 rows per day, noon-ish — well above epoch 0, see the
    * boundary-eviction gotcha), arrival pinned by name AND mtime. Rows
    * are built from UTC INSTANTS: every day assertion below is a UTC
    * day label (the session tz is pinned UTC), and Timestamp.valueOf
    * would construct in the HOST's zone — on a ≥UTC+13 host the rows
    * would shift to the previous UTC day and the assertions would fail
    * on correct product behavior. */
  private def slice(feed: java.nio.file.Path,
      name: String, days: Seq[Int], mtime: Long): Unit = {
    val sp = spark; import sp.implicits._
    val rows = days.flatMap(d => (0 until 3).map(i =>
      (s"$name-$d-$i", java.sql.Timestamp.from(
        java.time.Instant.parse(f"2024-01-$d%02dT12:00:0${i}Z")))))
    FeedStaging.writePinned(rows.toDF("id", "ts"), feed, name, mtime)
  }
  private def runDaily(feed: java.nio.file.Path, ckpt: java.nio.file.Path,
      queryName: String): Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = {
    val schema = spark.read.parquet(feed.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(feed.toString)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("date").as("day"), col("n"))
      .writeStream.outputMode("append").format("memory")
      .option("checkpointLocation", ckpt.toString)
      .queryName(queryName).start()
    try { q.processAllAvailable(); q.recentProgress.toSeq } finally q.stop()
  }

  private def emittedDays(queryName: String): Seq[(String, Long)] = {
    val sp = spark; import sp.implicits._
    val out = spark.table(queryName).orderBy("day")
      .select(col("day").cast("string"), col("n"))
      .as[(String, Long)].collect().toSeq
    try spark.catalog.dropTempView(queryName) catch { case _: Throwable => () }
    out
  }

  test("a late file one batch behind the advance is ADMITTED — the late filter lags eviction") {
    val base = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("graft_wm_lag"))
    val feed = base.resolve("feed"); Files.createDirectories(feed)
    slice(feed, "00_early", 1 to 3, 1000L)
    slice(feed, "01_advance", 21 to 25, 2000L)
    slice(feed, "02_late", 11 to 13, 3000L) // immediately after advance
    val progress = runDaily(feed, base.resolve("ckpt"), "wm_lag")
    // batch 2's eviction watermark is Jan 24 (max Jan 25 noon − 1 day),
    // but its LATE filter uses batch 1's recorded watermark — Jan 2,
    // from the early file — so the Jan 11-13 rows pass and their
    // already-below-eviction windows emit immediately
    assert(progress.exists(p => p.batchId == 2 &&
      p.stateOperators.head.numRowsDroppedByWatermark == 0))
    val days = emittedDays("wm_lag").map(_._1)
    assert(days.contains("2024-01-11") && days.contains("2024-01-13"))
  }

  test("a late file TWO batches behind the advance is dropped; append emits exactly the finalized windows") {
    val base = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("graft_wm_drop"))
    val feed = base.resolve("feed"); Files.createDirectories(feed)
    slice(feed, "00_early", 1 to 3, 1000L)
    slice(feed, "01_advance", 21 to 25, 2000L)
    slice(feed, "02_bridge", Seq(26), 3000L)
    slice(feed, "03_late", 11 to 13, 4000L)
    val progress = runDaily(feed, base.resolve("ckpt"), "wm_drop")
    // batch 3's late filter carries batch 2's recorded watermark =
    // max-through-batch-1 − 1 day = Jan 24 noon — every late row drops.
    // The filter sits AFTER the map-side partial aggregation (the metric
    // counts window GROUPS, not raw inputs): 9 rows → 3 day windows
    val b3 = progress.find(_.batchId == 3).get
    assert(b3.stateOperators.head.numRowsDroppedByWatermark == 3,
      s"expected all 3 late window groups dropped, got ${b3.stateOperators.head.numRowsDroppedByWatermark}")
    // emitted = windows finalized below the final watermark (Jan 25
    // noon): early days 1-3 and advance days 21-24; day 25's window ends
    // Jan 26 00:00 > wm and day 26 further still — held in state, never
    // emitted; the dropped days 11-13 appear NOWHERE
    assert(emittedDays("wm_drop") == Seq(
      "2024-01-01" -> 3L, "2024-01-02" -> 3L, "2024-01-03" -> 3L,
      "2024-01-21" -> 3L, "2024-01-22" -> 3L, "2024-01-23" -> 3L,
      "2024-01-24" -> 3L))
  }
}
