package graft.sources

import graft.core._
import graft.streaming._
import java.nio.file.{Files, Path, StandardOpenOption}
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** End-to-end tests of the `vitess-cdc` MicroBatchStream: fixture feed →
  * envelope DataFrame, offset round-trip, and restart-from-checkpoint
  * with no loss / no duplicates (SURVEY §7 minimum slice). */
class VitessCdcSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("vitess-cdc-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val t1Fields = Seq(
    FieldDef("id", "INT64", "bigint(20)", 20, 0, ColumnFlags.NotNull | ColumnFlags.PriKey),
    FieldDef("v", "VARCHAR", "varchar(32)", 32, 0, 0L))

  private def insertTx(shard: String, seq: Long, id: Long, v: String,
      host: String = "feed"): Seq[VEvent] = Seq(
    BeginEvent(shard, "ks"),
    FieldEvent(shard, "ks", "ks.t1", t1Fields, enumSetStringValues = false),
    RowEvent(shard, "ks", "ks.t1", Seq(
      RowChange(None, Some(PackedRow.of(Seq(Some(id.toString), Some(v))))))),
    VgtidEvent(shard, Vgtid(Seq(ShardGtid("ks", shard, s"MySQL56/$host:1-$seq")))),
    CommitEvent(shard, "ks", 1700000000L + seq))

  private def writeFeed(dir: Path, shard: String, events: Seq[VEvent], append: Boolean = false): Unit = {
    val file = dir.resolve(s"$shard.jsonl")
    val lines = events.map(VEventJson.write).mkString("", "\n", "\n")
    if (append)
      Files.writeString(file, lines, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    else Files.writeString(file, lines)
  }

  private def runToCompletion(feedDir: Path, checkpoint: Path, sinkTable: String): Unit = {
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .load()
      .writeStream
      .format("memory")
      .queryName(sinkTable)
      .option("checkpointLocation", checkpoint.toString)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  test("explicit-vgtid cold start skips history at the line level, not by decode") {
    // 40 history txs BEFORE the requested position, 10 after. The proof
    // that history is never JSON-decoded: every history ROW line is
    // corrupted into invalid JSON (prefixes intact, so the driver fold —
    // which only parses FIELD/VGTID/COMMIT lines — and the reader's
    // line-level skip both pass over them). A reader that still decoded
    // history to filter it would throw; the skip path must deliver the
    // 10 post-position transactions exactly.
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdccoldskip"))
    val all = (1L to 50L).flatMap { i =>
      insertTx("s0", i, i, s"v$i").map {
        case r: RowEvent if i <= 40 => VEventJson.write(r).dropRight(10) + "~corrupt~"
        case e => VEventJson.write(e)
      }
    }
    Files.writeString(feedDir.resolve("s0.jsonl"), all.mkString("", "\n", "\n"))
    def run(sink: String, extra: Map[String, String]): Seq[Long] = {
      val b0 = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString)
        .option("shard", "s0")
        .option("vgtid", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-40"))).json)
      val q = extra.foldLeft(b0) { case (b, (k, v)) => b.option(k, v) }.load()
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdccoldskipckpt")).toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.sql(
        s"SELECT CAST(get_json_object(after, '$$.id') AS LONG) FROM $sink " +
          "WHERE op = 'c' ORDER BY 1").collect().map(_.getLong(0)).toSeq
    }
    assert(run("cdc_cold_skip", Map.empty) == (41L to 50L))
    // with intra-shard splitting on, split cursors recorded in the
    // history region have GTIDs behind the requested start — the planner
    // must drop them, or a mid-history segment would re-admit (and here,
    // DECODE THE CORRUPTED) history rows
    assert(run("cdc_cold_skip_split", Map("split.partition.bytes" -> "1500")) == (41L to 50L))
  }

  test("split.partition.bytes fans one shard's window into tx-safe segments") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcsplitplan"))
    writeFeed(feedDir, "s0", (1L to 30L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", feedDir.toString)
    opts.put("split.partition.bytes", "2000")
    val stream = new VitessCdcStream(new CaseInsensitiveStringMap(opts))
    try {
      val start = stream.initialOffset()
      val end = stream.latestOffset(start, ReadLimit.allAvailable()).asInstanceOf[VgtidOffset]
      val cuts = end.splits.getOrElse("s0", Nil)
      assert(cuts.nonEmpty, "the fold must record split cursors on a multi-KB window")
      // every cut is a transaction-safe boundary: the line AT the cut
      // position begins a BEGIN (or is feed end)
      val bytes = Files.readAllBytes(feedDir.resolve("s0.jsonl"))
      cuts.foreach { c =>
        val next = new String(bytes, c.pos.toInt, math.min(20L, bytes.length - c.pos).toInt, "UTF-8")
        assert(next.startsWith("{\"type\":\"BEGIN\""), s"cut at ${c.pos} lands mid-transaction: $next")
      }
      // offset JSON round-trips the split cursors (recovery replans the
      // identical segments)
      assert(VgtidOffset.fromJson(end.json()) == end)
      // planner: one partition per segment, tiling the window exactly
      val parts = stream.planInputPartitions(start, end)
        .map(_.asInstanceOf[VitessCdcPartition]).sortBy(_.startByte)
      assert(parts.length == cuts.size + 1)
      assert(parts.head.startByte == 0L)
      parts.sliding(2).foreach {
        case Array(a, b) => assert(a.endByte == b.startByte, "segments must tile")
        case _ =>
      }
      assert(parts.last.endByte == bytes.length.toLong)
      // each mid-shard segment seeds from its cursor: real GTID + schema
      parts.tail.foreach { p =>
        assert(p.startPosJson.contains("MySQL56/feed"))
        assert(p.schemaLines.nonEmpty, "segment seed must carry the schema checkpoint")
      }
    } finally stream.stop()

    // the per-shard cap bounds cursors (offset size and task count) by
    // thinning evenly — the window still tiles, just coarser
    val optsCapped = new java.util.HashMap[String, String]()
    optsCapped.put("path", feedDir.toString)
    optsCapped.put("split.partition.bytes", "500")
    optsCapped.put("split.partitions.max.per.shard", "3")
    val capped = new VitessCdcStream(new CaseInsensitiveStringMap(optsCapped))
    try {
      val start = capped.initialOffset()
      val end = capped.latestOffset(start, ReadLimit.allAvailable()).asInstanceOf[VgtidOffset]
      val cuts = end.splits.getOrElse("s0", Nil)
      assert(cuts.size == 3, s"cap must thin to 3, got ${cuts.size}")
      assert(cuts.map(_.pos) == cuts.map(_.pos).sorted)
      val parts = capped.planInputPartitions(start, end)
      assert(parts.length == 4)
    } finally capped.stop()
  }

  test("no spurious empty batch after a split-carrying batch") {
    // Spark detects progress by offset-JSON equality; a rebuild that
    // loses feed_splits while nothing else changed must return the start
    // offset verbatim, or every split batch is followed by an empty one
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcsplitnospur"))
    writeFeed(feedDir, "s0", (1L to 20L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", feedDir.toString)
    opts.put("split.partition.bytes", "1500")
    val stream = new VitessCdcStream(new CaseInsensitiveStringMap(opts))
    try {
      val start = stream.initialOffset()
      val batch1 = stream.latestOffset(start, ReadLimit.allAvailable()).asInstanceOf[VgtidOffset]
      assert(batch1.splits.getOrElse("s0", Nil).nonEmpty)
      val batch2 = stream.latestOffset(batch1, ReadLimit.allAvailable())
      assert(batch2.json() == batch1.json(),
        "a no-progress trigger must be offset-identical to the split batch")
    } finally stream.stop()
  }

  test("intra-shard split partitions produce identical output: epochs, evolved schema") {
    // txs 1-10 on host A (2 columns); the schema evolves to 3 columns
    // inside tx 11 and the GTID host flips (epoch 0 → 1) for txs 11-20.
    // A tiny split target forces many mid-shard segments; their seeds
    // must carry the right GTID, epoch, and schema checkpoint or the
    // output diverges from the unsplit run.
    val f3 = t1Fields :+ FieldDef("extra", "VARCHAR", "varchar(32)", 32, 0, 0L)
    def tx3(shard: String, seq: Long, id: Long, v: String, x: String): Seq[VEvent] = Seq(
      BeginEvent(shard, "ks"),
      FieldEvent(shard, "ks", "ks.t1", f3, enumSetStringValues = false),
      RowEvent(shard, "ks", "ks.t1", Seq(
        RowChange(None, Some(PackedRow.of(Seq(Some(id.toString), Some(v), Some(x))))))),
      VgtidEvent(shard, Vgtid(Seq(ShardGtid("ks", shard, s"MySQL56/hostB:1-$seq")))),
      CommitEvent(shard, "ks", 1700000000L + seq))
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcsplite2e"))
    writeFeed(feedDir, "s0",
      (1L to 10L).flatMap(i => insertTx("s0", i, i, s"a$i", host = "hostA")))
    Files.writeString(feedDir.resolve("s0.jsonl"),
      (11L to 20L).flatMap(i => tx3("s0", i, i, s"b$i", s"x$i"))
        .map(VEventJson.write).mkString("", "\n", "\n"),
      StandardOpenOption.APPEND)
    def run(sink: String, opts: Map[String, String]): (Seq[Row], Path) = {
      val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcsplitckpt"))
      val b0 = spark.readStream.format("vitess-cdc").option("path", feedDir.toString)
      val q = opts.foldLeft(b0) { case (b, (k, v)) => b.option(k, v) }.load()
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.sql(
        s"SELECT CAST(get_json_object(after, '$$.id') AS LONG) AS id, after, epoch, " +
          s"vgtid, restart_vgtid, rank, total_order FROM $sink WHERE op = 'c' ORDER BY id")
        .collect().toSeq
      (rows, ckpt)
    }
    val (plain, _) = run("cdc_split_off", Map.empty)
    val (split, splitCkpt) = run("cdc_split_on", Map("split.partition.bytes" -> "1500"))
    assert(split == plain, "split run must be row-identical to the unsplit run")
    assert(plain.size == 20)
    assert(plain.take(10).forall(_.getLong(2) == 0L)) // host A epoch
    assert(plain.drop(10).forall(_.getLong(2) == 1L)) // flip folded into seeds
    assert(plain.last.getString(1).contains("x20")) // evolved column decoded
    // and the split run REALLY split: its committed offset carries cuts
    val offsetJson = Files.readString(splitCkpt.resolve("offsets").resolve("0"))
    assert(offsetJson.contains("\"feed_splits\""), "expected feed_splits in the offset log")
  }

  test("offset json round-trips the reference offset-map shape") {
    val off = VgtidOffset(
      Vgtid(Seq(ShardGtid("ks", "-80", "MySQL56/h:1-5"), ShardGtid("ks", "80-", "MySQL56/h:1-9"))),
      ShardEpochMap.empty.put("-80", 1L).put("80-", 2L),
      3L)
    val back = VgtidOffset.fromJson(off.json())
    assert(back == off)
    assert(off.json().contains("\"transaction_epoch\""))
    assert(off.json().contains("\"connector_generation\":3"))
  }

  test("reads a two-shard feed end-to-end with per-shard metadata") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt"))
    writeFeed(feedDir, "s0", (1L to 3L).flatMap(i => insertTx("s0", i, i, s"a$i")))
    writeFeed(feedDir, "s1", (1L to 2L).flatMap(i => insertTx("s1", i, 100 + i, s"b$i")))
    runToCompletion(feedDir, ckpt, "cdc_two_shards")
    val rows = spark.sql(
      "SELECT shard, op, after, tx_id, epoch, rank FROM cdc_two_shards ORDER BY shard, rank")
      .collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).toSeq == Seq("s0", "s0", "s0", "s1", "s1"))
    assert(rows.forall(_.getString(1) == "c"))
    assert(rows.head.getString(2) == """{"id":1,"v":"a1"}""")
    assert(rows.head.getString(3) == "MySQL56/feed:1-1")
    assert(rows.forall(_.getLong(4) == 0L))
    assert(rows.map(_.getString(5)).toSeq == Seq("1", "2", "3", "1", "2"))
  }

  test("shard option restricts streaming to the named shards; unknown shards fail fast") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcshardopt"))
    writeFeed(feedDir, "s0", (1L to 3L).flatMap(i => insertTx("s0", i, i, s"a$i")))
    writeFeed(feedDir, "s1", (1L to 2L).flatMap(i => insertTx("s1", i, 100 + i, s"b$i")))
    def run(shard: String, sink: String): Unit = {
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString)
        .option("shard", shard)
        .load()
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcshardckpt")).toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run("s1", "cdc_shard_only_s1")
    val rows = spark.sql("SELECT shard, rank FROM cdc_shard_only_s1 ORDER BY rank").collect()
    assert(rows.length == 2 && rows.forall(_.getString(0) == "s1"),
      s"only the configured shard streams: ${rows.toSeq}")
    // a shard absent from the topology fails the query, like a real
    // VStream request for a nonexistent shard
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run("s0, nope", "cdc_shard_unknown")
    }
    assert(err.getMessage.contains("nope") ||
      Option(err.getCause).exists(_.getMessage.contains("nope")))
    // an explicit vgtid must cover exactly the configured shard list
    val mismatch = intercept[Throwable] {
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString)
        .option("shard", "s0,s1")
        .option("vgtid", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-1"))).json)
        .load()
        .writeStream.format("memory").queryName("cdc_shard_vgtid_mismatch")
        .option("checkpointLocation", graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcshardckpt2")).toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(mismatch.getMessage.contains("must match the configured shard list") ||
      Option(mismatch.getCause).exists(_.getMessage.contains("must match the configured shard list")))
  }

  test("narrowing the shard list against an existing checkpoint fails fast, not silently") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcshardnarrow"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcshardnarrowckpt"))
    writeFeed(feedDir, "s0", (1L to 2L).flatMap(i => insertTx("s0", i, i, s"a$i")))
    writeFeed(feedDir, "s1", (1L to 2L).flatMap(i => insertTx("s1", i, 100 + i, s"b$i")))
    // first run unrestricted: the checkpoint now carries positions for both
    // shards (parquet sink — it supports restart-from-checkpoint)
    val outDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcshardnarrowout"))
    runToParquet(feedDir, ckpt, outDir)
    assert(spark.read.parquet(outDir.toString).count() == 4)
    // append new data so the restart has work, then restart the SAME
    // checkpoint restricted to s0: s1's checkpointed position would be
    // silently dropped from every new offset — must throw
    writeFeed(feedDir, "s0", insertTx("s0", 3, 3, "a3"), append = true)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString)
        .option("shard", "s0")
        .load()
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs(err).exists(_.contains("does not cover checkpointed")), msgs(err).mkString(" | "))
  }

  private def runToParquet(feedDir: Path, checkpoint: Path, outDir: Path): Unit = {
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .load()
      .writeStream
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", checkpoint.toString)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  test("incremental aggregate maintained per micro-batch equals the one-shot answer") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("graft_inc_feed"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("graft_inc_ckpt"))
    def packed(id: Long, v: String) = PackedRow.of(Seq(Some(id.toString), Some(v)))
    def rowTx(seq: Long, change: RowChange): Seq[VEvent] = Seq(
      BeginEvent("0", "ks"),
      FieldEvent("0", "ks", "ks.t1", t1Fields, enumSetStringValues = false),
      RowEvent("0", "ks", "ks.t1", Seq(change)),
      VgtidEvent("0", Vgtid(Seq(ShardGtid("ks", "0", s"MySQL56/feed:1-$seq")))),
      CommitEvent("0", "ks", 1700000000L + seq))
    // batch 1: three inserts; batch 2: a group-moving update, a delete, an insert
    writeFeed(feedDir, "0",
      rowTx(1, RowChange(None, Some(packed(10, "a")))) ++
        rowTx(2, RowChange(None, Some(packed(20, "a")))) ++
        rowTx(3, RowChange(None, Some(packed(30, "b")))))
    val deltas = scala.collection.mutable.ArrayBuffer.empty[(String, Long, BigDecimal)]
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        deltas.synchronized {
          deltas ++= graft.operators.Sink.aggDeltas(batch.toDF(), "t1", "v", "id")
            .collect().map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      writeFeed(feedDir, "0",
        rowTx(4, RowChange(Some(packed(20, "a")), Some(packed(20, "b")))) ++
          rowTx(5, RowChange(Some(packed(30, "b")), None)) ++
          rowTx(6, RowChange(None, Some(packed(40, "b")))),
        append = true)
      q.processAllAvailable()
    } finally q.stop()
    // final state: a = {10}, b = {20, 40}
    val byGrp = deltas.groupBy(_._1).view.mapValues(rs =>
      (rs.map(_._2).sum, rs.map(_._3).sum)).toMap
    assert(byGrp("a") == ((1L, BigDecimal(10))), s"group a wrong: $byGrp")
    assert(byGrp("b") == ((2L, BigDecimal(60))), s"group b wrong: $byGrp")
  }

  test("restart from checkpoint resumes with no loss and no duplicates") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed2"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt2"))
    val out = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcout2"))
    writeFeed(feedDir, "s0", (1L to 3L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    runToParquet(feedDir, ckpt, out)
    assert(spark.read.parquet(out.toString).count() == 3)

    // append two more transactions, restart with the same checkpoint
    writeFeed(feedDir, "s0", (4L to 5L).flatMap(i => insertTx("s0", i, i, s"v$i")), append = true)
    runToParquet(feedDir, ckpt, out)
    val ids = spark.read.parquet(out.toString)
      .selectExpr("get_json_object(after, '$.id')")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(ids == Seq("1", "2", "3", "4", "5")) // no loss, no duplicates
  }

  test("restart vgtid on records allows inclusive replay") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed3"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt3"))
    writeFeed(feedDir, "s0", (1L to 3L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    runToCompletion(feedDir, ckpt, "cdc_replay")
    val rows = spark.sql(
      "SELECT get_json_object(after, '$.id') AS id, restart_vgtid FROM cdc_replay ORDER BY id")
      .collect()
    // record of tx 2 carries tx 1's position: restarting there replays tx 2
    assert(rows(1).getString(1).contains("MySQL56/feed:1-1"))
    assert(rows(2).getString(1).contains("MySQL56/feed:1-2"))
  }

  test("epoch bumps when the GTID host set changes mid-stream") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed4"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt4"))
    writeFeed(feedDir, "s0",
      (1L to 2L).flatMap(i => insertTx("s0", i, i, s"v$i")) ++
        insertTx("s0", 3, 3, "v3", host = "failover"))
    runToCompletion(feedDir, ckpt, "cdc_epoch")
    val rows = spark.sql(
      "SELECT get_json_object(after, '$.id') AS id, epoch FROM cdc_epoch ORDER BY id")
      .collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 0L, 1L))
  }

  test("epoch continuity across a checkpoint restart (host change in new batch)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed5"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt5"))
    val out = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcout5"))
    writeFeed(feedDir, "s0", (1L to 2L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    runToParquet(feedDir, ckpt, out)
    writeFeed(feedDir, "s0", insertTx("s0", 3, 3, "v3", host = "failover"), append = true)
    runToParquet(feedDir, ckpt, out)
    val rows = spark.read.parquet(out.toString)
      .selectExpr("get_json_object(after, '$.id') AS id", "epoch")
      .orderBy("id").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 0L, 1L))
  }

  test("empty shard files are excluded from partition planning (F5)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed7"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt7"))
    writeFeed(feedDir, "s0", insertTx("s0", 1, 1, "x"))
    Files.writeString(feedDir.resolve("s9.jsonl"), "") // empty shard
    runToCompletion(feedDir, ckpt, "cdc_empty_shard")
    val shards = spark.sql("SELECT DISTINCT shard FROM cdc_empty_shard")
      .collect().map(_.getString(0)).toSeq
    assert(shards == Seq("s0"))
  }

  test("per-batch heartbeat records carry the end offset (H1)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed8"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt8"))
    writeFeed(feedDir, "s0", (1L to 2L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("heartbeat.batch", "true")
      .load()
      .writeStream.format("memory").queryName("cdc_hb")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val hb = spark.sql("SELECT vgtid FROM cdc_hb WHERE op = 'heartbeat'").collect()
    assert(hb.length == 1)
    assert(hb.head.getString(0).contains("MySQL56/feed:1-2")) // end offset
    assert(spark.sql("SELECT count(*) FROM cdc_hb WHERE op = 'c'").first().getLong(0) == 2)
  }

  test("interval heartbeats: NOOP at 0, one per elapsed interval with current offset") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed22"))
    // commit timestamps 1 s apart (insertTx uses 1700000000 + seq)
    writeFeed(feedDir, "s0", (1L to 5L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    def run(name: String, intervalMs: Long): Unit = {
      val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory(s"ck$name"))
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString)
        .option("heartbeat.interval.ms", intervalMs.toString)
        .load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    run("cdc_hb0", 0L) // NOOP: no heartbeat records at interval 0
    assert(spark.sql("SELECT count(*) FROM cdc_hb0 WHERE op = 'heartbeat'")
      .first().getLong(0) == 0L)
    run("cdc_hb2", 2000L) // 5 txs 1 s apart → heartbeats after tx 3 and tx 5
    val hb = spark.sql(
      "SELECT vgtid FROM cdc_hb2 WHERE op = 'heartbeat' ORDER BY ts_ms")
      .collect().map(_.getString(0)).toSeq
    assert(hb.length == 2)
    assert(hb(0).contains("MySQL56/feed:1-3")) // current offset at emission
    assert(hb(1).contains("MySQL56/feed:1-5"))
    assert(spark.sql("SELECT count(*) FROM cdc_hb2 WHERE op = 'c'").first().getLong(0) == 5)
  }

  test("interval heartbeats keep their cadence across bounded micro-batches") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed28"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt28"))
    // 5 txs 1 s apart, one tx per batch: the baseline must survive batch
    // boundaries via the checkpointed heartbeat_ms, or no heartbeat ever
    // fires (each single-tx batch would just re-seed the baseline)
    writeFeed(feedDir, "s0", (1L to 5L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("heartbeat.interval.ms", "2000")
      .option("max.txs.per.trigger", "1")
      .load()
      .writeStream.format("memory").queryName("cdc_hb_bounded")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val hb = spark.sql(
      "SELECT vgtid FROM cdc_hb_bounded WHERE op = 'heartbeat' AND ts_ms > 0 ORDER BY ts_ms")
      .collect().map(_.getString(0)).toSeq
    assert(hb.length == 2, s"expected heartbeats after tx 3 and tx 5, got $hb")
    assert(hb(0).contains("MySQL56/feed:1-3"))
    assert(hb(1).contains("MySQL56/feed:1-5"))
  }

  test("feed slice: unterminated tail line is not returned and never advances position") {
    val dir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcslice"))
    val f = dir.resolve("s0.jsonl")
    Files.writeString(f, "line one\nline two\npartial tail with no newline")
    val s1 = new FeedSlice(f.toString, 0L)
    try {
      assert(s1.readLine() == "line one")
      assert(s1.readLine() == "line two")
      val posAfterComplete = s1.position
      assert(s1.readLine() == null) // torn tail stays unread
      assert(s1.position == posAfterComplete) // position still at a line start
      // the appender finishes the line: resuming from the recorded
      // position yields the WHOLE line, not a mid-line fragment
      Files.writeString(f, " now complete\nnext\n", StandardOpenOption.APPEND)
      val s2 = new FeedSlice(f.toString, posAfterComplete)
      try {
        assert(s2.readLine() == "partial tail with no newline now complete")
        assert(s2.readLine() == "next")
        assert(s2.readLine() == null)
      } finally s2.close()
    } finally s1.close()
  }

  test("tx torn between VGTID and COMMIT is delivered whole on the next trigger") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed29"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt29"))
    val out = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcout29"))
    val tx2 = insertTx("s0", 2, 2, "torn")
    // tx1 complete; tx2's BEGIN/FIELD/ROW/VGTID lines written but its
    // COMMIT not yet — the appender is mid-transaction when the trigger
    // fires. The offset must NOT fold tx2's VGTID, or the resume filter
    // would treat it as already delivered.
    writeFeed(feedDir, "s0", insertTx("s0", 1, 1, "a") ++ tx2.dropRight(1))
    def run(): Unit = {
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString)
        .load()
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out.toString).count() == 1) // only tx1 so far
    // appender finishes tx2 and adds tx3
    writeFeed(feedDir, "s0", tx2.takeRight(1) ++ insertTx("s0", 3, 3, "c"), append = true)
    run()
    val ids = spark.read.parquet(out.toString)
      .selectExpr("get_json_object(after, '$.id') AS id").orderBy("id")
      .collect().map(_.getString(0)).toSeq
    assert(ids == Seq("1", "2", "3")) // tx2 neither lost nor duplicated
  }

  test("metadata scans: shards, non-empty shards, tables, keyspaces (S6)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed9"))
    writeFeed(feedDir, "s0", insertTx("s0", 1, 1, "x"))
    Files.writeString(feedDir.resolve("s9.jsonl"), "")
    assert(Metadata.shards(feedDir.toString) == Seq("s0", "s9"))
    assert(Metadata.nonEmptyShards(feedDir.toString) == Seq("s0"))
    assert(Metadata.tables(spark, feedDir.toString) == Seq("ks.t1"))
    assert(Metadata.keyspaces(spark, feedDir.toString) == Seq("ks"))
    assert(Metadata.escapeLike("a_b%c") == "a\\_b\\%c")
  }

  test("metadata scans: empty feed dir answers empty, torn line skipped, bare names not keyspaces") {
    // a fresh staging dir (no .jsonl yet) answers like shards(): empty —
    // not an AnalysisException from a matchless glob
    val fresh = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeedfresh"))
    assert(Metadata.tables(spark, fresh.toString).isEmpty)
    assert(Metadata.keyspaces(spark, fresh.toString).isEmpty)
    // a live feed's torn trailing FIELD fragment is skipped, not fatal;
    // bare (keyspace-less) wire table names never masquerade as keyspaces
    val live = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeedtorn"))
    val whole = insertTx("s0", 1, 1, "x").map(VEventJson.write).mkString("", "\n", "\n")
    val bare = VEventJson.write(
      FieldEvent("s0", "ks", "t_bare", t1Fields, enumSetStringValues = false))
    Files.writeString(live.resolve("s0.jsonl"),
      whole + bare + "\n" + """{"kind":"FIELD","shard":"s0","keysp""")
    assert(Metadata.tables(spark, live.toString) == Seq("ks.t1", "t_bare"))
    assert(Metadata.keyspaces(spark, live.toString) == Seq("ks"))
  }

  test("checkpointed SHOW TABLES/DATABASES reads zero feed bytes behind the offset") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed9b"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt9b"))
    writeFeed(feedDir, "s0", insertTx("s0", 1, 1, "x"))
    runToCompletion(feedDir, ckpt, "cdc_meta_ckpt")
    // the checkpointed offset: Spark's OffsetSeqLog stores "v1", the batch
    // metadata line, then one offset JSON line per source
    val offsetsDir = ckpt.resolve("offsets")
    val latest = Files.list(offsetsDir).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    val off = VgtidOffset.fromJson(Files.readAllLines(latest).asScala.last)
    assert(off.positions.nonEmpty && off.schemas.nonEmpty)
    // overwrite the feed with SAME-LENGTH garbage: if the checkpointed
    // path read any byte behind the offset it would now throw or return
    // junk — correct answers prove the call is pure checkpoint + size
    // metadata
    val feed = feedDir.resolve("s0.jsonl")
    val size = Files.size(feed).toInt
    Files.write(feed, Array.fill[Byte](size)('x'))
    assert(Metadata.tables(feedDir.toString, off) == Seq("ks.t1"))
    assert(Metadata.keyspaces(feedDir.toString, off) == Seq("ks"))
    // bytes past the checkpointed position ARE scanned: a new table's
    // FIELD event appended after the offset must surface in the list
    writeFeed(feedDir, "s0", Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.t2", t1Fields, enumSetStringValues = false),
      RowEvent("s0", "ks", "ks.t2", Seq(RowChange(None, Some(PackedRow.of(Seq(Some("9"), Some("z"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-2")))),
      CommitEvent("s0", "ks", 1700000099L)), append = true)
    assert(Metadata.tables(feedDir.toString, off) == Seq("ks.t1", "ks.t2"))
  }

  test("copy phase: enum/set decode as labels, lastpk rides the offset, seamless switch (S5)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed10"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt10"))
    val enumFields = Seq(
      FieldDef("id", "INT64", "bigint(20)", 20, 0, ColumnFlags.NotNull | ColumnFlags.PriKey),
      FieldDef("size", "ENUM", "enum('s','m','l')", 0, 0, 0L))
    val copyVgtid = Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-1", Seq(
      TableLastPk("t1",
        Seq(PkField("id", "INT64", 63, Some(49667))),
        Seq(PkRow(Seq("1"), java.util.Base64.getEncoder.encodeToString("1".getBytes))))))))
    val copy: Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      // copy phase sends enum values as label strings
      FieldEvent("s0", "ks", "ks.t1", enumFields, enumSetStringValues = true),
      RowEvent("s0", "ks", "ks.t1", Seq(RowChange(None, Some(PackedRow.of(Seq(Some("1"), Some("m"))))))),
      VgtidEvent("s0", copyVgtid),
      CommitEvent("s0", "ks", 1L),
      CopyCompletedEvent("s0"))
    val streamTx: Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      // streaming phase sends enum values as 1-based indexes
      FieldEvent("s0", "ks", "ks.t1", enumFields, enumSetStringValues = false),
      RowEvent("s0", "ks", "ks.t1", Seq(RowChange(None, Some(PackedRow.of(Seq(Some("2"), Some("3"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-2")))),
      CommitEvent("s0", "ks", 2L))
    writeFeed(feedDir, "s0", copy ++ streamTx)
    runToCompletion(feedDir, ckpt, "cdc_copy")
    val rows = spark.sql(
      "SELECT get_json_object(after, '$.id') AS id, get_json_object(after, '$.size') AS sz, vgtid " +
        "FROM cdc_copy WHERE op = 'c' ORDER BY id")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "m") // copy-phase label passthrough
    assert(rows(1).getString(1) == "l") // streaming index 3 → 'l'
    assert(rows(0).getString(2).contains("table_p_ks")) // lastpk in position
    assert(Vgtid.of(rows(0).getString(2)).willTriggerVStreamCopy)
  }

  test("heartbeat tables excluded unless stream.keyspace.heartbeats (H2)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed11"))
    val hbTx: Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.heartbeat", t1Fields, enumSetStringValues = false),
      RowEvent("s0", "ks", "ks.heartbeat", Seq(RowChange(None, Some(PackedRow.of(Seq(Some("1"), Some("x"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-2")))),
      CommitEvent("s0", "ks", 2L))
    writeFeed(feedDir, "s0", insertTx("s0", 1, 1, "keep") ++ hbTx)
    def run(name: String, opt: Boolean): Seq[String] = {
      val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory(s"ck$name"))
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString)
        .option("stream.keyspace.heartbeats", opt.toString)
        .load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
      spark.sql(s"SELECT DISTINCT table FROM $name WHERE op = 'c' ORDER BY table")
        .collect().map(_.getString(0)).toSeq
    }
    assert(run("cdc_hb_off", opt = false) == Seq("t1"))
    assert(run("cdc_hb_on", opt = true) == Seq("heartbeat", "t1"))
  }

  test("snapshot.tables restricts the copy phase but not streaming (F3)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed12"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt12"))
    def copyVgtid(seq: Long) = Vgtid(Seq(ShardGtid("ks", "s0", s"MySQL56/feed:1-$seq", Seq(
      TableLastPk("t1", Seq(PkField("id", "INT64", 63, None)), Seq(PkRow(Seq("1"), "MQ==")))))))
    def copyTx(seq: Long, table: String): Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", s"ks.$table", t1Fields, enumSetStringValues = true),
      RowEvent("s0", "ks", s"ks.$table", Seq(RowChange(None, Some(PackedRow.of(Seq(Some(seq.toString), Some("c"))))))),
      VgtidEvent("s0", copyVgtid(seq)),
      CommitEvent("s0", "ks", seq))
    // copy phase streams t1 and t2; snapshot filter keeps only t1; the
    // post-copy streaming tx on t2 must still flow
    val events = copyTx(1, "t1") ++ copyTx(2, "t2") ++ Seq(CopyCompletedEvent("s0")) ++ Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.t2", t1Fields, enumSetStringValues = false),
      RowEvent("s0", "ks", "ks.t2", Seq(RowChange(None, Some(PackedRow.of(Seq(Some("9"), Some("x"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-3")))),
      CommitEvent("s0", "ks", 3L))
    writeFeed(feedDir, "s0", events)
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("snapshot.tables", "ks\\.t1")
      .load()
      .writeStream.format("memory").queryName("cdc_snapfilter")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.sql(
      "SELECT table, get_json_object(after, '$.id') FROM cdc_snapfilter WHERE op = 'c' ORDER BY 2")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("t1", "1"), ("t2", "9"))) // copy of t2 skipped, stream of t2 kept
  }

  test("retriable error classification and retry (E1)") {
    assert(Retry.isRetriable(new java.io.IOException("conn reset")))
    assert(!Retry.isRetriable(new java.io.FileNotFoundException("gone")))
    assert(!Retry.isRetriable(new IllegalStateException("ordering")))
    var attempts = 0
    val out = Retry.withRetries(maxAttempts = 3, initialBackoffMs = 1) {
      attempts += 1
      if (attempts < 3) throw new java.io.IOException("flaky")
      42
    }
    assert(out == 42 && attempts == 3)
    intercept[IllegalStateException] {
      Retry.withRetries(maxAttempts = 3, initialBackoffMs = 1) {
        throw new IllegalStateException("not retriable")
      }
    }
  }

  test("max.txs.per.trigger bounds each micro-batch (admission control)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed13"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt13"))
    writeFeed(feedDir, "s0", (1L to 5L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("max.txs.per.trigger", "2")
      .load()
      .writeStream.format("memory").queryName("cdc_bounded")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    // all 5 transactions delivered exactly once, across >= 3 batches
    val ids = spark.sql("SELECT get_json_object(after, '$.id') FROM cdc_bounded ORDER BY 1")
      .collect().map(_.getString(0)).toSeq
    assert(ids == Seq("1", "2", "3", "4", "5"))
    val batches = spark.sql("SELECT count(DISTINCT vgtid) FROM cdc_bounded").first().getLong(0)
    assert(batches == 5) // one position per tx, regardless of batching
  }

  test("max.bytes.per.trigger bounds batch bytes even with a fat transaction") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed13b"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt13b"))
    // tx 3 is ~20x fatter than the rest (a bulk-load transaction); the
    // byte cap cannot split it, but must (a) stop admitting right after
    // it and (b) keep every OTHER batch at one small tx
    val fat = "x" * 4000
    writeFeed(feedDir, "s0", (1L to 5L).flatMap(i =>
      insertTx("s0", i, i, if (i == 3) fat else s"v$i")))
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("max.bytes.per.trigger", "200")
      .load()
      .writeStream.format("memory").queryName("cdc_byte_bounded")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    // all 5 transactions exactly once
    val ids = spark.sql(
      "SELECT get_json_object(after, '$.id') FROM cdc_byte_bounded ORDER BY 1")
      .collect().map(_.getString(0)).toSeq
    assert(ids == Seq("1", "2", "3", "4", "5"))
    // each micro-batch admitted exactly ONE tx (the 200-byte cap is below
    // any single tx size, so every safe boundary past the cap is the first
    // one; the fat tx rides alone, whole): the offset log must show at
    // least 5 committed batches
    val batches = Files.list(ckpt.resolve("offsets")).count()
    assert(batches >= 5, s"expected >= 5 single-tx micro-batches, got $batches")
  }

  test("tx and byte caps compose: the tighter cap binds admission") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed13c"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt13c"))
    writeFeed(feedDir, "s0", (1L to 6L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    // tx cap would allow 10 per batch; the 200-byte cap (below any single
    // tx) forces one tx per batch — the byte limit must bind
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("max.txs.per.trigger", "10")
      .option("max.bytes.per.trigger", "200")
      .load()
      .writeStream.format("memory").queryName("cdc_both_caps")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.sql(
      "SELECT get_json_object(after, '$.id') FROM cdc_both_caps ORDER BY 1")
      .collect().map(_.getString(0)).toSeq
    assert(ids == (1 to 6).map(_.toString))
    val batches = Files.list(ckpt.resolve("offsets")).count()
    assert(batches >= 6, s"byte cap should bind over the loose tx cap, got $batches batches")
  }

  test("reshard: a new shard appearing mid-stream inherits max(parent)+1 epoch (A4)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed14"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt14"))
    val out = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcreshardout"))
    // parent shard "-80": two txs, host change bumps its epoch to 1
    writeFeed(feedDir, "-80",
      insertTx("-80", 1, 1, "a") ++ insertTx("-80", 2, 2, "b", host = "failover"))
    def run(): Unit = {
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString)
        .option("inherit.epoch", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // reshard: child "40-60" (overlaps [-inf,80)) appears
    writeFeed(feedDir, "40-60", insertTx("40-60", 1, 10, "c"))
    run()
    val rows = spark.read.parquet(out.toString)
      .where("op = 'c' AND shard = '40-60'")
      .selectExpr("shard", "epoch").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("40-60", 2L)))
  }

  test("stop.on.reshard fails the query when a new shard appears; restart resumes it (S3)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed23"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt23"))
    val out = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcout23"))
    writeFeed(feedDir, "-80", insertTx("-80", 1, 1, "a"))
    def start() = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("stop.on.reshard", "true")
      .load()
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString).start()
    val q = start()
    try {
      q.processAllAvailable() // parent-only topology streams fine
      // reshard WHILE the query runs: the child shard appears mid-stream
      writeFeed(feedDir, "40-60", insertTx("40-60", 1, 10, "c"))
      var waited = 0
      while (q.exception.isEmpty && waited < 30000) { Thread.sleep(100); waited += 100 }
      assert(q.exception.exists(_.toString.contains("stop.on.reshard")))
    } finally q.stop()
    // a restart re-resolves the topology and admits the child
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(out.toString)
      .selectExpr("get_json_object(after, '$.id') AS id").orderBy("id")
      .collect().map(_.getString(0)).toSeq
    assert(ids == Seq("1", "10"))
  }

  test("mid-copy restart resumes from lastpk with no loss and no duplicates (S5 hard part d)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed15"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt15"))
    val out = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcout15"))
    // copy-phase txs: the GTID stays fixed at the snapshot position while
    // lastpk advances — exactly like a real VStream copy
    def copyTx(pk: Long): Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.t1", t1Fields, enumSetStringValues = true),
      RowEvent("s0", "ks", "ks.t1", Seq(
        RowChange(None, Some(PackedRow.of(Seq(Some(pk.toString), Some(s"c$pk"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-1", Seq(
        TableLastPk("t1",
          Seq(PkField("id", "INT64", 63, None)),
          Seq(PkRow(Seq(pk.toString.length.toString),
            java.util.Base64.getEncoder.encodeToString(pk.toString.getBytes))))))))),
      CommitEvent("s0", "ks", pk))
    def run(): Unit = {
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString).load()
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    // first run sees only half the copy
    writeFeed(feedDir, "s0", (1L to 2L).flatMap(copyTx))
    run()
    assert(spark.read.parquet(out.toString).count() == 2)
    // copy continues after the restart: two more rows, then completion +
    // a streaming transaction
    writeFeed(feedDir, "s0",
      (3L to 4L).flatMap(copyTx) ++ Seq(CopyCompletedEvent("s0"): VEvent) ++
        insertTx("s0", 2, 99, "streamed"), append = true)
    run()
    val ids = spark.read.parquet(out.toString)
      .selectExpr("get_json_object(after, '$.id')")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(ids == Seq("1", "2", "3", "4", "99")) // every copy row exactly once
  }

  test("DDL between batches delivers exactly once (offset-after-DDL)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed16"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt16"))
    val out = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcout16"))
    def run(): Unit = {
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString).load()
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    writeFeed(feedDir, "s0", insertTx("s0", 1, 1, "a"))
    run()
    // the server sends [VGTID, DDL] with an advanced position (the DDL
    // rotates the offset), then a further transaction
    writeFeed(feedDir, "s0", Seq(
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-2")))),
      DdlEvent("s0", "ks", "ALTER TABLE t1 ADD c INT", 42L)) ++
      insertTx("s0", 3, 3, "b"), append = true)
    run()
    run() // third run: nothing new, nothing duplicated
    val ops = spark.read.parquet(out.toString)
      .selectExpr("op").collect().map(_.getString(0)).toSeq.sorted
    assert(ops == Seq("c", "c", "ddl"))
    val ddlPos = spark.read.parquet(out.toString)
      .where("op = 'ddl'").selectExpr("vgtid").first().getString(0)
    assert(ddlPos.contains("MySQL56/feed:1-2"))
  }

  test("include.schema.changes=false drops DDL records but not data") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed24"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt24"))
    writeFeed(feedDir, "s0",
      insertTx("s0", 1, 1, "a") ++ Seq(
        VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-2")))),
        DdlEvent("s0", "ks", "ALTER TABLE t1 ADD c INT", 42L)) ++
        insertTx("s0", 3, 3, "b"))
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("include.schema.changes", "false")
      .load()
      .writeStream.format("memory").queryName("cdc_no_ddl")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val ops = spark.sql("SELECT op FROM cdc_no_ddl ORDER BY op")
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("c", "c"))
  }

  test("snapshot.mode=never starts at current and skips copy-phase rows") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed25"))
    val copyVgtid = Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-1", Seq(
      TableLastPk("t1", Seq(PkField("id", "INT64", 63, None)), Seq(PkRow(Seq("1"), "MQ==")))))))
    val copy: Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.t1", t1Fields, enumSetStringValues = true),
      RowEvent("s0", "ks", "ks.t1", Seq(RowChange(None, Some(PackedRow.of(Seq(Some("1"), Some("m"))))))),
      VgtidEvent("s0", copyVgtid),
      CommitEvent("s0", "ks", 1L),
      CopyCompletedEvent("s0"))
    writeFeed(feedDir, "s0", copy ++ insertTx("s0", 2, 2, "streamrow"))
    def run(name: String, mode: String): Seq[String] = {
      val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory(s"ck$name"))
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString)
        .option("snapshot.mode", mode)
        .load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
      spark.sql(s"SELECT get_json_object(after, '$$.id') FROM $name WHERE op = 'c' ORDER BY 1")
        .collect().map(_.getString(0)).toSeq
    }
    assert(run("cdc_snap_initial", "initial") == Seq("1", "2")) // copy + stream
    assert(run("cdc_snap_never", "never") == Seq("2")) // stream only
  }

  test("shard.epoch.map seeds per-shard epochs at first start") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed26"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt26"))
    writeFeed(feedDir, "s0", insertTx("s0", 1, 1, "a"))
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("shard.epoch.map", """{"s0":7}""")
      .load()
      .writeStream.format("memory").queryName("cdc_seed_epoch")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val epochs = spark.sql("SELECT DISTINCT epoch FROM cdc_seed_epoch WHERE op = 'c'")
      .collect().map(_.getLong(0)).toSeq
    assert(epochs == Seq(7L))
  }

  test("override.datetime.to.nullable: zero datetime on NOT NULL column becomes null") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed27"))
    val dtFields = Seq(
      FieldDef("id", "INT64", "bigint(20)", 20, 0, ColumnFlags.NotNull | ColumnFlags.PriKey),
      FieldDef("dt", "DATETIME", "datetime", 19, 0, ColumnFlags.NotNull))
    val tx: Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.t1", dtFields, enumSetStringValues = false),
      RowEvent("s0", "ks", "ks.t1", Seq(
        RowChange(None, Some(PackedRow.of(Seq(Some("1"), Some("0000-00-00 00:00:00"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-1")))),
      CommitEvent("s0", "ks", 1L))
    writeFeed(feedDir, "s0", tx)
    def run(name: String, enable: Boolean): String = {
      val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory(s"ck$name"))
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString)
        .option("override.datetime.to.nullable", enable.toString)
        .load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
      spark.sql(s"SELECT after FROM $name WHERE op = 'c'").first().getString(0)
    }
    assert(run("cdc_dt_default", enable = false).contains("1970-01-01")) // epoch fallback
    assert(run("cdc_dt_nullable", enable = true).contains("\"dt\":null"))
  }

  test("bounded batches also cap copy-phase progress (admission + lastpk)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed17"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt17"))
    def copyTx(pk: Long): Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.t1", t1Fields, enumSetStringValues = true),
      RowEvent("s0", "ks", "ks.t1", Seq(
        RowChange(None, Some(PackedRow.of(Seq(Some(pk.toString), Some(s"c$pk"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-1", Seq(
        TableLastPk("t1",
          Seq(PkField("id", "INT64", 63, None)),
          Seq(PkRow(Seq(pk.toString.length.toString),
            java.util.Base64.getEncoder.encodeToString(pk.toString.getBytes))))))))),
      CommitEvent("s0", "ks", pk))
    writeFeed(feedDir, "s0", (1L to 5L).flatMap(copyTx))
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("max.txs.per.trigger", "2")
      .load()
      .writeStream.format("memory").queryName("cdc_copy_bounded")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.sql(
      "SELECT get_json_object(after, '$.id') FROM cdc_copy_bounded WHERE op = 'c' ORDER BY 1")
      .collect().map(_.getString(0)).toSeq
    assert(ids == Seq("1", "2", "3", "4", "5")) // all copy rows, exactly once, across batches
  }

  test("FeedSlice resumes across EOF: a torn line completes on a later read") {
    val dir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcslice"))
    val f = dir.resolve("s0.jsonl")
    Files.writeString(f, "{\"a\":1}\n{\"b\":")
    val slice = new FeedSlice(f.toString, 0L)
    try {
      assert(slice.readLine() == "{\"a\":1}")
      val posAfterFirst = slice.position
      // torn tail: not surfaced, position pinned at the line boundary
      assert(slice.readLine() == null)
      assert(slice.position == posAfterFirst)
      // the appender finishes the line (+ one more); the SAME slice
      // resumes mid-line without re-opening — the tailer contract
      Files.writeString(f, "2}\n{\"c\":3}\n", StandardOpenOption.APPEND)
      assert(slice.readLine() == "{\"b\":2}")
      assert(slice.readLine() == "{\"c\":3}")
      assert(slice.readLine() == null)
      assert(slice.position == Files.size(f))
    } finally slice.close()
  }

  test("offset json round-trips feed positions and schema checkpoint") {
    val off = VgtidOffset(
      Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/h:1-5"))),
      ShardEpochMap.empty.put("s0", 1L),
      1L,
      positions = Map("s0" -> 12345L),
      schemas = Map("s0" -> Map("ks.t1" -> VEventJson.write(
        FieldEvent("s0", "ks", "ks.t1", t1Fields, enumSetStringValues = false)))))
    val back = VgtidOffset.fromJson(off.json())
    assert(back == off)
    assert(off.json().contains("\"feed_positions\""))
    // serialization is deterministic (Spark compares offset JSON strings)
    assert(off.json() == back.json())
  }

  test("trigger work is bounded by new bytes, not total feed size") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed18"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt18"))
    val out = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcout18"))
    def run(): Unit = {
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString).load()
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    // 50 transactions of history (5 lines each = 250 lines)
    writeFeed(feedDir, "s0", (1L to 50L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    run()
    // append 2 transactions (10 lines); the restarted stream must NOT
    // replay the 250-line history — driver scan and reader both seek
    writeFeed(feedDir, "s0", (51L to 52L).flatMap(i => insertTx("s0", i, i, s"v$i")), append = true)
    val before = FeedSlice.linesRead.get()
    run()
    val delta = FeedSlice.linesRead.get() - before
    // one driver scan + one reader pass over the 10 new lines, plus the
    // final no-data scan (0 lines); anything near 250 means a full replay
    assert(delta <= 40L, s"expected O(new lines) work, read $delta lines")
    val ids = spark.read.parquet(out.toString)
      .selectExpr("CAST(get_json_object(after, '$.id') AS LONG)")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == (1L to 52L)) // and still exactly-once
  }

  test("default admission is metadata-only: zero feed lines scanned on the trigger thread") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed23"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt23"))
    writeFeed(feedDir, "s0", (1L to 20L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    writeFeed(feedDir, "s1", (1L to 20L).flatMap(i => insertTx("s1", i, 100 + i, s"w$i")))
    val before = VitessCdcStream.triggerScanLines.get()
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString).load()
      .writeStream.format("memory").queryName("cdc_meta_only")
      .option("checkpointLocation", ckpt.toString).start()
    try {
      q.processAllAvailable()
      // growth while the query is LIVE: the background tailers (not the
      // trigger thread) absorb the new bytes before the next cut
      writeFeed(feedDir, "s0", (21L to 25L).flatMap(i => insertTx("s0", i, i, s"v$i")), append = true)
      q.processAllAvailable()
    } finally q.stop()
    assert(VitessCdcStream.triggerScanLines.get() == before,
      "unbounded admission must not scan feed lines on the trigger thread")
    val ids = spark.sql("SELECT CAST(get_json_object(after, '$.id') AS LONG) FROM cdc_meta_only")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == ((1L to 25L) ++ (101L to 120L))) // exactly-once, both shards
  }

  test("source metrics ride StreamingQueryProgress: shards, lag, admitted txs") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed25"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt25"))
    writeFeed(feedDir, "s0", (1L to 7L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    writeFeed(feedDir, "s1", (1L to 4L).flatMap(i => insertTx("s1", i, 100 + i, s"w$i")))
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString).load()
      .writeStream.format("memory").queryName("cdc_metrics")
      .option("checkpointLocation", ckpt.toString).start()
    val metrics = try {
      q.processAllAvailable()
      q.lastProgress.sources.head.metrics
    } finally q.stop()
    assert(metrics.get("shards") == "2")
    assert(metrics.get("lagBytes") == "0") // fully consumed
    assert(metrics.get("admittedTransactions") == "11")
  }

  test("tailer pool bounds driver threads below shard count, exactly-once intact") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed26"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt26"))
    val nShards = 24
    (0 until nShards).foreach { i =>
      writeFeed(feedDir, f"s$i%02d", (1L to 3L).flatMap(k => insertTx(f"s$i%02d", k, i * 100L + k, s"v$k")))
    }
    // thread bound, checked directly on a pool (per-pool thread names —
    // a JVM-global count would race with concurrently-running suites)
    val transport = FileFeedTransport(feedDir.toString, excludeEmptyShards = true)
    val pool = new TailerPool(maxThreads = 3, pollMs = 2)
    try {
      val tailers = transport.listShards().map { case (sh, loc) =>
        val t = new ShardTailer(
          transport, loc, sh, "ks",
          ShardCursor(0L, graft.core.ShardGtid("ks", sh, ""), 0L, Map.empty, Long.MinValue, 0L),
          graft.core.ShardGtid("ks", sh, ""), heartbeatIntervalMs = 0L)
        pool.register(t)
        (t, loc)
      }
      tailers.foreach { case (t, loc) =>
        t.awaitCaughtUp(transport.size(loc), 10000, () => pool.nudgeAll())
      }
      assert(pool.workerCount <= 3, s"24 shards must multiplex over <= 3 pool threads")
      val arr = new Array[Thread](Thread.activeCount() + 32)
      Thread.enumerate(arr)
      val own = arr.count(t => t != null && t.isAlive &&
        t.getName.startsWith(s"vitess-cdc-tailer-${pool.poolId}-"))
      assert(own <= 3, s"saw $own threads for pool ${pool.poolId}")
    } finally pool.shutdown()
    // end-to-end over the same feed: exactly-once with a capped pool
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("tail.threads", "3")
      .load()
      .writeStream.format("memory").queryName("cdc_pool")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.sql("SELECT CAST(get_json_object(after, '$.id') AS LONG) FROM cdc_pool")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == (0 until nShards).flatMap(i => (1L to 3L).map(i * 100L + _)).sorted)
  }

  test("capped admission scans synchronously but stays bounded by the cap") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed24"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt24"))
    writeFeed(feedDir, "s0", (1L to 6L).flatMap(i => insertTx("s0", i, i, s"v$i")))
    val before = VitessCdcStream.triggerScanLines.get()
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("max.txs.per.trigger", "2")
      .load()
      .writeStream.format("memory").queryName("cdc_capped_scan")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    assert(VitessCdcStream.triggerScanLines.get() > before) // the bounded synchronous path
    val ids = spark.sql("SELECT CAST(get_json_object(after, '$.id') AS LONG) FROM cdc_capped_scan")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == (1L to 6L))
  }

  test("multi-table in-flight copy: restart at every prefix, no loss, no duplicates") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed20"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt20"))
    val out = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcout20"))
    def lastPk(table: String, v: Option[Long]): TableLastPk =
      TableLastPk(table, Seq(PkField("id", "INT64", 63, None)),
        v.toSeq.map(x => PkRow(Seq(x.toString.length.toString),
          java.util.Base64.getEncoder.encodeToString(x.toString.getBytes))))
    // VGTID carries BOTH tables while t1 is in flight (t2 listed, not yet
    // started); t1's entry is removed once its copy completes — the
    // reference's multi-table table_p_ks shape
    def copyTx(table: String, id: Long, pks: Seq[TableLastPk]): Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", s"ks.$table", t1Fields, enumSetStringValues = true),
      RowEvent("s0", "ks", s"ks.$table", Seq(
        RowChange(None, Some(PackedRow.of(Seq(Some(id.toString), Some(s"c$id"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-1", pks)))),
      CommitEvent("s0", "ks", id))
    val units: Seq[Seq[VEvent]] = Seq(
      copyTx("t1", 1, Seq(lastPk("t1", Some(1)), lastPk("t2", None))),
      copyTx("t1", 2, Seq(lastPk("t1", Some(2)), lastPk("t2", None))),
      copyTx("t2", 11, Seq(lastPk("t2", Some(11)))),
      copyTx("t2", 12, Seq(lastPk("t2", Some(12)))),
      Seq(CopyCompletedEvent("s0")),
      insertTx("s0", 2, 99, "streamed"))
    def run(): Unit = {
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString).load()
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    // restart at EVERY prefix: append one unit, run a fresh stream on the
    // same checkpoint, repeat — the offset's multi-table position must
    // never misorder admission/skip
    units.foreach { unit =>
      writeFeed(feedDir, "s0", unit, append = true)
      run()
    }
    val ids = spark.read.parquet(out.toString)
      .where("op = 'c'")
      .selectExpr("CAST(get_json_object(after, '$.id') AS LONG)")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 2L, 11L, 12L, 99L)) // each row exactly once
  }

  test("schema checkpoint lets a seeked reader decode without FIELD replay") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed19"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt19"))
    val out = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcout19"))
    // like a real VStream feed: FIELD is sent only with the FIRST tx
    def tx(seq: Long, withField: Boolean): Seq[VEvent] =
      Seq(BeginEvent("s0", "ks")) ++
        (if (withField)
          Seq(FieldEvent("s0", "ks", "ks.t1", t1Fields, enumSetStringValues = false))
        else Nil) ++ Seq(
        RowEvent("s0", "ks", "ks.t1", Seq(
          RowChange(None, Some(PackedRow.of(Seq(Some(seq.toString), Some(s"v$seq"))))))),
        VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", s"MySQL56/feed:1-$seq")))),
        CommitEvent("s0", "ks", seq))
    def run(): Unit = {
      val q = spark.readStream.format("vitess-cdc")
        .option("path", feedDir.toString).load()
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    writeFeed(feedDir, "s0", tx(1, withField = true) ++ tx(2, withField = false))
    run()
    // the appended tx has no FIELD event; the restarted reader seeks past
    // the only FIELD line in the file and must decode via the offset's
    // schema checkpoint
    writeFeed(feedDir, "s0", tx(3, withField = false), append = true)
    run()
    val rows = spark.read.parquet(out.toString)
      .selectExpr("get_json_object(after, '$.id') AS id", "get_json_object(after, '$.v') AS v")
      .orderBy("id").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "v1"), ("2", "v2"), ("3", "v3")))
  }

  test("type handling mode options reach the reader's decoder (D7)") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed21"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt21"))
    val fields = Seq(
      FieldDef("id", "INT64", "bigint(20)", 20, 0, ColumnFlags.NotNull | ColumnFlags.PriKey),
      FieldDef("u", "UINT64", "bigint(20) unsigned", 20, 0, 0L),
      FieldDef("b", "BLOB", "blob", 0, 0, 0L),
      FieldDef("ts", "TIMESTAMP", "timestamp", 19, 0, 0L))
    val tx: Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.t1", fields, enumSetStringValues = false),
      RowEvent("s0", "ks", "ks.t1", Seq(RowChange(None, Some(PackedRow.of(
        Seq(Some("1"), Some("-1"), Some("AB"), Some("2021-01-02 03:04:05"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-1")))),
      CommitEvent("s0", "ks", 1L))
    writeFeed(feedDir, "s0", tx)
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("bigint.unsigned.handling.mode", "precise")
      .option("binary.handling.mode", "hex")
      .option("time.precision.mode", "isostring")
      .load()
      .writeStream.format("memory").queryName("cdc_modes")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val r = spark.sql(
      "SELECT get_json_object(after, '$.u'), get_json_object(after, '$.b'), " +
        "get_json_object(after, '$.ts') FROM cdc_modes WHERE op = 'c'").first()
    assert(r.getString(0) == "18446744073709551615") // -1 wire value +2^64
    assert(r.getString(1) == "4142") // hex of "AB"
    assert(r.getString(2) == "2021-01-02 03:04:05") // isostring passthrough
    intercept[IllegalArgumentException] {
      graft.core.ValueConversion.TypeModes.parse(None, None, Some("adaptive"))
    }
  }

  test("unknown datatypes are omitted unless include.unknown.datatypes; tablet.type validated") {
    val fields = Seq(
      FieldDef("id", "INT64", "bigint(20)", 20, 0, ColumnFlags.NotNull | ColumnFlags.PriKey),
      FieldDef("geo", "GEOMETRY", "geometry", 0, 0, 0L)) // resolves to Unknown
    val tx: Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.t1", fields, enumSetStringValues = false),
      RowEvent("s0", "ks", "ks.t1", Seq(RowChange(None, Some(PackedRow.of(
        Seq(Some("7"), Some("POINTBYTES"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-1")))),
      CommitEvent("s0", "ks", 1L))

    def run(name: String, opts: Map[String, String]): String = {
      val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory(s"cdcfeed_$name"))
      val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory(s"cdcckpt_$name"))
      writeFeed(feedDir, "s0", tx)
      val reader = spark.readStream.format("vitess-cdc").option("path", feedDir.toString)
      val q = opts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
        .load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
      spark.sql(s"SELECT after FROM $name WHERE op = 'c'").first().getString(0)
    }

    // reference default: the unknown-typed field is dropped from the record
    val dropped = run("cdc_unknown_default", Map.empty)
    assert(dropped.contains("\"id\""))
    assert(!dropped.contains("geo"))
    // …but an unknown-typed PRIMARY KEY column must survive the default
    // drop: keys are built from this payload, and omitting it would
    // collapse every row of the table to a single key
    val pkFields = Seq(
      FieldDef("gid", "GEOMETRY", "geometry", 0, 0, ColumnFlags.NotNull | ColumnFlags.PriKey),
      FieldDef("v", "VARCHAR", "varchar(8)", 8, 0, ColumnFlags.NotNull))
    val pkTx: Seq[VEvent] = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.t1", pkFields, enumSetStringValues = false),
      RowEvent("s0", "ks", "ks.t1", Seq(RowChange(None, Some(PackedRow.of(
        Seq(Some("GEOKEY"), Some("x"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-1")))),
      CommitEvent("s0", "ks", 1L))
    val pkFeed = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed_unkpk"))
    val pkCkpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt_unkpk"))
    writeFeed(pkFeed, "s0", pkTx)
    val pq = spark.readStream.format("vitess-cdc").option("path", pkFeed.toString)
      .load()
      .writeStream.format("memory").queryName("cdc_unknown_pk")
      .option("checkpointLocation", pkCkpt.toString).start()
    try pq.processAllAvailable() finally pq.stop()
    val pkRow = spark.sql("SELECT key, after FROM cdc_unknown_pk WHERE op = 'c'").first()
    assert(pkRow.getString(0).contains("gid")) // key carries the unknown-typed PK
    assert(pkRow.getString(1).contains("gid"))
    // opt-in: the field survives as an opaque binary representation
    val kept = run("cdc_unknown_kept", Map("include.unknown.datatypes" -> "true"))
    assert(kept.contains("geo"))
    // tablet.type: valid values accepted (any case), typos fail the start
    val ok = run("cdc_tablet_ok", Map("tablet.type" -> "replica"))
    assert(ok.contains("\"id\""))
    val err = intercept[Exception] {
      run("cdc_tablet_bad", Map("tablet.type" -> "primary"))
    }
    assert(err.getMessage.contains("tablet.type") ||
      Option(err.getCause).exists(_.getMessage.contains("tablet.type")))
  }

  test("table include filter prunes other tables inside the reader") {
    val feedDir = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcfeed6"))
    val ckpt = graft.TempDirs.reclaimOnExit(Files.createTempDirectory("cdcckpt6"))
    val t2 = Seq(
      BeginEvent("s0", "ks"),
      FieldEvent("s0", "ks", "ks.t2", t1Fields, enumSetStringValues = false),
      RowEvent("s0", "ks", "ks.t2", Seq(RowChange(None, Some(PackedRow.of(Seq(Some("9"), Some("x"))))))),
      VgtidEvent("s0", Vgtid(Seq(ShardGtid("ks", "s0", "MySQL56/feed:1-2")))),
      CommitEvent("s0", "ks", 2L))
    writeFeed(feedDir, "s0", insertTx("s0", 1, 1, "keep") ++ t2)
    val q = spark.readStream.format("vitess-cdc")
      .option("path", feedDir.toString)
      .option("tables.include", "ks\\.t1")
      .load()
      .writeStream.format("memory").queryName("cdc_filtered")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val tables = spark.sql("SELECT DISTINCT table FROM cdc_filtered WHERE op = 'c'")
      .collect().map(_.getString(0)).toSeq
    assert(tables == Seq("t1"))
  }
}
