package graft.sources

import graft.core._
import graft.streaming._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.{CountDownLatch, Executor, TimeUnit}
import org.sparkproject.connect.grpc.{CallCredentials, ManagedChannel, Metadata, MethodDescriptor}
import org.sparkproject.connect.grpc.stub.{ClientCalls, StreamObserver}

/** gRPC plumbing shared by the client transport and the test server:
  * the VStream method descriptor over raw-bytes marshalling (the
  * hand-rolled [[VtWire]] codec replaces protoc-generated messages). */
object VtGrpc {
  object BytesMarshaller extends MethodDescriptor.Marshaller[Array[Byte]] {
    override def stream(value: Array[Byte]): java.io.InputStream =
      new java.io.ByteArrayInputStream(value)
    override def parse(stream: java.io.InputStream): Array[Byte] = stream.readAllBytes()
  }

  /** `vtgateservice.Vitess/VStream` — the public vtgateservice.proto
    * service the reference's VitessGrpc stub calls. */
  val VStreamMethod: MethodDescriptor[Array[Byte], Array[Byte]] =
    MethodDescriptor.newBuilder(BytesMarshaller, BytesMarshaller)
      .setFullMethodName("vtgateservice.Vitess/VStream")
      .setType(MethodDescriptor.MethodType.SERVER_STREAMING)
      .build()

  /** `vtgateservice.Vitess/Execute` — the unary SQL RPC the reference's
    * metadata queries ride (VitessReplicationConnection.java:71-95). */
  val ExecuteMethod: MethodDescriptor[Array[Byte], Array[Byte]] =
    MethodDescriptor.newBuilder(BytesMarshaller, BytesMarshaller)
      .setFullMethodName("vtgateservice.Vitess/Execute")
      .setType(MethodDescriptor.MethodType.UNARY)
      .build()

  /** The reference's StaticAuthCredentials (io.vitess.client.grpc):
    * username/password ride every call as ASCII metadata. */
  final class StaticAuth(username: String, password: String) extends CallCredentials {
    override def applyRequestMetadata(
        requestInfo: CallCredentials.RequestInfo,
        appExecutor: Executor,
        applier: CallCredentials.MetadataApplier): Unit = {
      val md = new Metadata()
      md.put(Metadata.Key.of("username", Metadata.ASCII_STRING_MARSHALLER), username)
      md.put(Metadata.Key.of("password", Metadata.ASCII_STRING_MARSHALLER), password)
      applier.apply(md)
    }
  }
}

/** Everything needed to construct the channel + VStream request — the
  * config keys round 4 only validated, now consumed for real (reference
  * VitessReplicationConnection.java:302-338 request, :374-385 channel). */
final case class GrpcConfig(
    target: String, // "host:port", or "inprocess:<name>" for tests
    keyspace: String,
    /** explicit shard topology; empty → discovered from vtgate via
      * `SHOW VITESS_SHARDS` (or `SHOW VITESS_TABLETS` with
      * [[excludeEmptyShards]]) over the Execute RPC, like the reference
      * (VitessMetadata.getShards, java:64-75) */
    shards: Seq[String] = Nil,
    /** F5: restrict discovery to shards with a serving tablet
      * (reference exclude.empty.shards) */
    excludeEmptyShards: Boolean = false,
    /** ingest parallelism: the feeder runs min(maxStreams, #shards)
      * concurrent VStreams over round-robin shard groups — the
      * reference's task planning (VitessConnector.java:87-156: tasks.max
      * tasks, shard i → task i mod numTasks, each task its own VStream).
      * 1 = the single-stream path. */
    maxStreams: Int = 1,
    tabletType: String = "MASTER",
    stopOnReshard: Boolean = false,
    streamKeyspaceHeartbeats: Boolean = false,
    heartbeatSeconds: Int = 0,
    /** include-table filter rules; a leading '/' makes the match a
      * regex, vitess planbuilder semantics — the reference expands
      * regexes to concrete tables via SHOW TABLES first
      * (VitessReplicationConnection.java:316-327); without a metadata
      * connection the regex form expresses the same filter. */
    includeTables: Seq[String] = Nil,
    tablesToCopy: Seq[String] = Nil,
    excludeKeyspaceFromTableName: Boolean = false,
    initialGtid: String = Vgtid.EmptyGtid, // "" → copy; "current" → skip history
    keepaliveMs: Option[Long] = None,
    maxInboundMessageSize: Option[Int] = None,
    loadBalancingPolicy: Option[String] = None,
    headers: Map[String, String] = Map.empty,
    username: Option[String] = None,
    password: Option[String] = None) extends Serializable

/** Live VTGate transport: driver-side gRPC consumers stage the VStream
  * into the same durable per-shard JSONL feed the file transport reads.
  *
  * Architecture (SURVEY S1 at scale): min(maxStreams, #shards)
  * concurrent VStreams — one per round-robin shard group, the
  * reference's task planning (VitessConnector.java:87-156) — land
  * events into shared storage; executors read the staging files in
  * parallel exactly like any file feed (`open`/`size` delegate to the
  * file mechanics, so positions stay byte offsets and every existing
  * offset/replay/reshard rule applies unchanged). Each consumer is the
  * same role as the reference's per-task stream-observer thread
  * (VitessReplicationConnection.java:107-343) — but here it ONLY stages
  * bytes; decode runs distributed. On restart each stream resumes from
  * the last STAGED VGTID of its own shards, so the staging log never
  * loses or duplicates server transactions; engine offsets into the
  * staging log are an independent (checkpointed) layer.
  *
  * The staging directory must be shared storage in a multi-node
  * deployment (executors open it by path, like any Spark checkpoint or
  * source directory).
  */
final case class VStreamGrpcTransport(stagingDir: String, cfg: GrpcConfig)
    extends VStreamTransport {

  private val inner = FileFeedTransport(stagingDir, excludeEmptyShards = false)

  // driver-only: executors deserialize this transport and use only
  // open()/size(), which never touch the feeder
  @transient @volatile private var feederStarted = false
  @transient private lazy val feeder: GrpcFeeder = {
    val f = new GrpcFeeder(stagingDir, cfg)
    f.start()
    feederStarted = true
    f
  }

  override def listShards(): Seq[(String, String)] = {
    feeder.ensureRunning()
    feeder.shards.map(sh => sh -> Paths.get(stagingDir, s"$sh.jsonl").toString)
  }

  override def open(locator: String, from: Long, to: Long): VStreamSlice =
    inner.open(locator, from, to)

  override def size(locator: String): Long = inner.size(locator)

  /** No-op when the feeder never started — closing a stream that was
    * stopped before listShards() must not lazily build a channel and
    * subscribe just to tear it down. */
  override def close(): Unit = if (feederStarted) feeder.close()

  /** Test hook: block until the server completed the stream and all
    * received events are durably staged. */
  private[sources] def awaitStreamCompleted(timeoutMs: Long): Unit =
    feeder.awaitCompleted(timeoutMs)
}

/** The driver-side VStream consumer pool: resolves the shard topology
  * (explicit or discovered over the Execute RPC), builds one shared
  * channel with the reference's tuning knobs, and runs one
  * [[StreamWorker]] per round-robin shard group, each staging VEventJson
  * lines into its shards' feed files at transaction-safe boundaries. */
private[sources] final class GrpcFeeder(stagingDir: String, cfg: GrpcConfig) {

  private val dir = Paths.get(stagingDir)
  @volatile private var channel: ManagedChannel = null
  @volatile private var failure: Throwable = null
  private val completed = new CountDownLatch(1)
  @volatile private var started = false
  @volatile private var closed = false

  /** Shard topology and the expanded include-table list: an explicit
    * shard list is authoritative; otherwise discovery runs the
    * reference's metadata queries over the Execute RPC
    * (VitessMetadata.getShards). A regex include rule (leading '/') is
    * expanded to concrete tables via SHOW TABLES before it reaches the
    * VStream filter, like the reference
    * (VitessReplicationConnection.java:316-327) — so the server only
    * ever sees concrete `select * from t` rules. One SQL channel serves
    * both lookups, then closes. */
  private[sources] val (shards: Seq[String], includeTables: Seq[String]) = {
    val needShards = cfg.shards.isEmpty
    val needTables = cfg.includeTables.exists(_.startsWith("/"))
    if (!needShards && !needTables) (cfg.shards.sorted, cfg.includeTables)
    else {
      val sql = new VtgateSql(cfg)
      try {
        val shards =
          if (!needShards) cfg.shards.sorted
          else if (cfg.excludeEmptyShards) GrpcMetadata.nonEmptyShards(sql, cfg.keyspace)
          else GrpcMetadata.shards(sql, cfg.keyspace).sorted
        val tables =
          if (!needTables) cfg.includeTables
          else {
            // target SHOW TABLES with the JUST-computed shard set (not
            // cfg.shards, which is empty when discovery ran): one
            // VITESS_TABLETS round-trip, and the expansion shard can
            // never diverge from the subscribed topology
            val all = GrpcMetadata.tables(sql, cfg.keyspace, cfg.excludeEmptyShards, shards)
            // An include list that expands to ZERO tables produces zero
            // rules, and zero rules means NO VStream filter — the server
            // then streams every table (reference parity:
            // VitessReplicationConnection.java:336 only sets the filter
            // when getRulesCount() > 0). Correctness is preserved because
            // the engine-side include/exclude filters (F1/F2) still drop
            // non-included tables from the decoded records; the cost is
            // staging bandwidth, the same trade the reference makes.
            cfg.includeTables.flatMap { t =>
              if (t.startsWith("/")) {
                // vitess planbuilder regex-rule semantics: unanchored match
                val re = t.stripPrefix("/").r
                all.filter(tb => re.findFirstIn(tb).isDefined)
              } else Seq(t)
            }.distinct
          }
        (shards, tables)
      } finally sql.close()
    }
  }
  require(shards.nonEmpty, s"no shards for keyspace ${cfg.keyspace}: none configured, none discovered")

  private val writers: Map[String, java.io.OutputStream] = {
    Files.createDirectories(dir)
    shards.map { sh =>
      val p = dir.resolve(s"$sh.jsonl")
      if (!Files.exists(p)) Files.createFile(p)
      else truncateToTxBoundary(p)
      sh -> Files.newOutputStream(p, StandardOpenOption.APPEND)
    }.toMap
  }

  /** Startup recovery: truncate the staging file back to the last
    * TRANSACTION-SAFE boundary. A crash can persist (a) a torn final
    * line and (b) a complete-line prefix of an unfinished transaction
    * (BEGIN/ROW with no COMMIT — the in-memory tx buffer below prevents
    * this in normal operation, but an OS-level crash can persist a
    * prefix of a single multi-line append). Appending a server replay
    * after either would corrupt the feed (the replayed transaction's
    * BEGIN arrives while one is open, which TransactionAssembler
    * rejects). Engine offsets only ever point at transaction-safe
    * boundaries (TxBoundaryFold publishes nothing inside a tx), so
    * truncating to the last one never discards admitted bytes.
    * FeedSlice never surfaces a torn tail line, so one boundary fold
    * handles both cases. */
  private def truncateToTxBoundary(p: java.nio.file.Path): Unit = {
    val total = Files.size(p)
    if (total == 0) return
    var safeEnd = 0L
    var inTx = false
    val slice = new FeedSlice(p.toString, 0L)
    try {
      var line = slice.readLine()
      while (line != null) {
        if (line.startsWith(FeedSlice.BeginPrefix)) inTx = true
        else if (line.startsWith(FeedSlice.CommitPrefix)) inTx = false
        if (!inTx) safeEnd = slice.position
        line = slice.readLine()
      }
    } finally slice.close()
    if (safeEnd < total) {
      val ch = java.nio.channels.FileChannel.open(p, StandardOpenOption.WRITE)
      try { ch.truncate(safeEnd); () } finally ch.close()
    }
  }

  /** Round-robin shard groups — the reference's task planning
    * (VitessConnector.java:87-156: numTasks = min(tasks.max, #shards),
    * shard i → task i mod numTasks). Each group gets its OWN VStream,
    * so ingest bandwidth scales with streams instead of being ceilinged
    * by one server stream + one writer thread; streams multiplex over
    * one shared HTTP/2 channel. */
  private[sources] val shardGroups: Seq[Seq[String]] = {
    val n = math.max(1, math.min(cfg.maxStreams, shards.size))
    shards.zipWithIndex.groupBy(_._2 % n).toSeq.sortBy(_._1).map(_._2.map(_._1))
  }

  private val workers: Seq[StreamWorker] = shardGroups.map(new StreamWorker(_))

  def ensureRunning(): Unit = {
    if (failure != null)
      throw new IllegalStateException("vstream grpc feeder failed", failure)
    if (!started) start()
  }

  def start(): Unit = synchronized {
    if (started) return
    started = true
    channel = GrpcChannels.build(cfg)
    workers.foreach(_.subscribe(attempt = 0))
  }

  def awaitCompleted(timeoutMs: Long): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    workers.foreach { w =>
      val left = (deadline - System.nanoTime()) / 1000000L
      if (!w.completed.await(math.max(1L, left), TimeUnit.MILLISECONDS))
        throw new IllegalStateException("vstream did not complete in time")
    }
    if (failure != null)
      throw new IllegalStateException("vstream grpc feeder failed", failure)
  }

  def close(): Unit = {
    closed = true
    if (channel != null) {
      channel.shutdownNow()
      channel.awaitTermination(5, TimeUnit.SECONDS)
    }
    writers.values.foreach(w => try w.close() catch { case _: Exception => () })
  }

  private val maxReconnects = 5

  /** One shard-group's VStream: its own subscription, resume position,
    * reconnect state, and transaction buffers. Workers never share a
    * shard (round-robin partition), so each staging file has exactly one
    * writer and no cross-worker synchronization is needed on the hot
    * path. This is the reference's per-task VitessReplicationConnection
    * (VitessConnector plans one connection per task over its shard
    * group). */
  private final class StreamWorker(groupShards: Seq[String]) {

    private[GrpcFeeder] val completed = new CountDownLatch(1)

    /** Resume position: last VGTID staged per group shard (the stream's
      * own progress marker), else the configured initial position.
      * Reconnects read the in-memory flush marker (O(1) — a reconnect
      * after hours of staging must not re-scan the file); only the
      * startup call, before anything was flushed, falls back to the
      * bounded BACKWARD tail scan of the staging file. */
    private def resumeVgtid(): Vgtid = synchronized {
      Vgtid(groupShards.map { sh =>
        lastStaged.get(sh)
          .orElse(GrpcFeeder.lastStagedVgtid(dir.resolve(s"$sh.jsonl"), sh))
          .getOrElse(ShardGtid(cfg.keyspace, sh, cfg.initialGtid))
      })
    }

    private def buildRequest(): VtWire.VStreamRequestModel = {
      def quote(id: String) = "`" + id.replace("`", "``") + "`"
      VtWire.VStreamRequestModel(
        tabletType = VtWire.TabletType.byName.getOrElse(
          cfg.tabletType.toUpperCase(java.util.Locale.ROOT), 1),
        vgtid = resumeVgtid(),
        // reference :316-327: one rule per included table, filter sql
        // form; regexes were already expanded to concrete tables above
        rules = includeTables.map(t => t -> s"select * from ${quote(t)}"),
        flags = VtWire.VStreamFlagsModel(
          heartbeatIntervalSec = cfg.heartbeatSeconds,
          stopOnReshard = cfg.stopOnReshard,
          streamKeyspaceHeartbeats = cfg.streamKeyspaceHeartbeats,
          excludeKeyspaceFromTableName = cfg.excludeKeyspaceFromTableName,
          tablesToCopy = cfg.tablesToCopy))
    }

    /** One VStream subscription. A retriable failure (every gRPC status
      * error — the reference's VitessErrorHandler.java:23-30 stance)
      * re-subscribes after backoff FROM THE LAST STAGED VGTID, so a
      * VTGate bounce never loses or duplicates staged transactions; the
      * attempt counter resets whenever a subscription made progress, and
      * `maxReconnects` consecutive no-progress failures surface as the
      * stream failure. Reconnects are per-worker: one group's bounce
      * never disturbs the other streams. */
    private[GrpcFeeder] def subscribe(attempt: Int): Unit = {
      // a reconnect abandons any buffered partial transaction — the
      // resumed stream replays it from the last STAGED vgtid
      resetPending()
      // reference startStreaming: headers ride a client interceptor,
      // credentials a CallCredentials (VitessReplicationConnection.java:112-127)
      val ch = GrpcChannels.decorated(channel, cfg)
      val callOptions = GrpcChannels.callOptions(cfg)
      val observer = new StreamObserver[Array[Byte]] {
        @volatile private var progressed = false
        override def onNext(responseBytes: Array[Byte]): Unit =
          try { stage(VtWire.decodeVStreamResponse(responseBytes)); progressed = true }
          catch { case t: Throwable => failure = t }
        override def onError(t: Throwable): Unit = {
          val retryAttempt = if (progressed) 1 else attempt + 1
          if (failure == null && !closed && Retry.isRetriable(t) && retryAttempt <= maxReconnects) {
            val backoffMs = math.min(50L << retryAttempt, 2000L)
            val reconnector = new Thread(s"vstream-grpc-reconnect") {
              override def run(): Unit = {
                Thread.sleep(backoffMs)
                if (!closed) subscribe(retryAttempt)
              }
            }
            reconnector.setDaemon(true)
            reconnector.start()
          } else {
            if (failure == null && !closed) failure = t
            completed.countDown()
          }
        }
        override def onCompleted(): Unit = completed.countDown()
      }
      ClientCalls.asyncServerStreamingCall(
        ch.newCall(VtGrpc.VStreamMethod, callOptions),
        VtWire.encodeVStreamRequest(buildRequest()),
        observer)
    }

    // Per-shard transaction buffer: events accumulate here and reach the
    // durable staging file only at transaction-safe boundaries — on
    // COMMIT, or immediately for standalone events while no transaction
    // is open. This is the reference's buffer-until-commit stance
    // (VitessReplicationConnection buffers a partial transaction in
    // memory and reset()s it on error, committing offsets only at
    // boundaries): a disconnect mid-transaction leaves the staging file
    // at a safe boundary, so the resumed stream's replay of the open
    // transaction appends cleanly instead of producing a BEGIN-while-open
    // sequence that would permanently poison executor reads of that
    // region. Driver memory is bounded by one in-flight transaction per
    // shard — the same bound the reference's event buffer has.
    private val pending = scala.collection.mutable.Map[String, scala.collection.mutable.ArrayBuffer[String]]()
    private val inTx = scala.collection.mutable.Set[String]()
    // resume markers: `lastStaged` only ever reflects FLUSHED bytes (the
    // durable resume floor); `pendingVgtid` rides the tx buffer and is
    // promoted on flush, dropped with the buffer on reconnect
    private val lastStaged = scala.collection.mutable.Map[String, ShardGtid]()
    private val pendingVgtid = scala.collection.mutable.Map[String, ShardGtid]()

    /** Drop buffered partial transactions (reconnect path: the resumed
      * stream replays them from the last STAGED vgtid). */
    private def resetPending(): Unit = synchronized {
      pending.values.foreach(_.clear())
      pendingVgtid.clear()
      inTx.clear()
    }

    /** Append one response batch to this group's staging feeds at
      * transaction-safe boundaries. Events without a shard attribution
      * (a multi-shard VGTID between transactions) go to every group
      * shard they carry a position for — each shard's fold extracts only
      * its own entry, mirroring how the engine already treats
      * multi-shard VGTID lines. */
    private def stage(events: Seq[VEvent]): Unit = synchronized {
      events.foreach { e =>
        val targets: Seq[String] = e match {
          case VgtidEvent(sh, v) if sh.isEmpty =>
            v.shardGtids.map(_.shard).filter(groupShards.contains)
          case _ if e.shard.nonEmpty => Seq(e.shard)
          case _ => groupShards // shard-less heartbeat: liveness for the group
        }
        targets.foreach { sh =>
          if (groupShards.contains(sh)) {
            val line = e match {
              case VgtidEvent(s, v) if s.isEmpty => VEventJson.write(VgtidEvent(sh, v))
              case HeartbeatEvent(s) if s.isEmpty => VEventJson.write(HeartbeatEvent(sh))
              case other => VEventJson.write(other)
            }
            pending.getOrElseUpdate(sh, scala.collection.mutable.ArrayBuffer[String]()) += line
            e match {
              case _: BeginEvent => inTx += sh
              case _: CommitEvent => inTx -= sh
              case VgtidEvent(_, v) => v.shardGtid(sh).foreach(sg => pendingVgtid(sh) = sg)
              case _ =>
            }
            if (!inTx.contains(sh)) flushPending(sh)
          }
        }
      }
    }

    private def flushPending(sh: String): Unit = {
      val buf = pending(sh)
      if (buf.nonEmpty) {
        val w = writers(sh)
        buf.foreach { line =>
          w.write(line.getBytes(StandardCharsets.UTF_8))
          w.write('\n')
        }
        w.flush()
        buf.clear()
        // the buffered VGTID is durable now — it becomes the resume floor
        pendingVgtid.remove(sh).foreach(sg => lastStaged(sh) = sg)
      }
    }
  }
}

private[sources] object GrpcFeeder {
  /** Last staged VGTID for `shard`, via a bounded BACKWARD window scan
    * (64 KiB, quadrupling until a hit or file start) instead of a
    * forward full scan — staging files grow without bound at scale, but
    * a VGTID line lands every transaction, so the first window nearly
    * always suffices. Only complete lines count: a window not starting
    * at 0 skips its first (partial) line, and bytes after the last
    * newline (a crash-torn tail) are ignored. */
  private[sources] val TailScanMaxWindow: Long = 16L * 1024 * 1024

  private[sources] def lastStagedVgtid(
      p: java.nio.file.Path, shard: String): Option[ShardGtid] = {
    val total = if (Files.exists(p)) Files.size(p) else 0L
    if (total == 0) return None
    val ch = java.nio.channels.FileChannel.open(p, StandardOpenOption.READ)
    try {
      var window = 64L * 1024
      var done = false
      while (!done && window <= TailScanMaxWindow) {
        val start = math.max(0L, total - window)
        val len = (total - start).toInt // window cap keeps this in Int range
        val buf = java.nio.ByteBuffer.allocate(len)
        ch.position(start)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        require(!buf.hasRemaining, s"short read of $p")
        val text = new String(buf.array(), StandardCharsets.UTF_8)
        val from = if (start == 0) 0 else text.indexOf('\n') + 1 // 0 if none: scan nothing below
        val lastNl = text.lastIndexOf('\n')
        if (lastNl >= from && (start == 0 || from > 0)) {
          val lines = text.substring(from, lastNl).split("\n", -1)
          var i = lines.length - 1
          while (i >= 0) {
            val line = lines(i)
            if (line.startsWith(FeedSlice.VgtidPrefix)) VEventJson.read(line) match {
              case VgtidEvent(_, v) =>
                v.shardGtid(shard) match {
                  case found @ Some(_) => return found
                  case None =>
                }
              case _ =>
            }
            i -= 1
          }
        }
        done = start == 0
        window *= 4
      }
      if (done) None
      else {
        // pathological tail (no vgtid in the last TailScanMaxWindow
        // bytes): fall back to the O(1)-memory forward streaming scan —
        // bounded heap beats bounded time here, a giant window buffer
        // must never OOM the driver
        var last: Option[ShardGtid] = None
        val slice = new FeedSlice(p.toString, 0L)
        try slice.lines.foreach { line =>
          if (line.startsWith(FeedSlice.VgtidPrefix)) VEventJson.read(line) match {
            case VgtidEvent(_, v) => v.shardGtid(shard).foreach(sg => last = Some(sg))
            case _ =>
          }
        } finally slice.close()
        last
      }
    } finally ch.close()
  }
}
