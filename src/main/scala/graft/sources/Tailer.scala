package graft.sources

import graft.core._
import graft.streaming._

/** Per-shard transaction-safe cursor: everything the streaming offset
  * carries for one shard, as of a byte position that is NEVER inside a
  * transaction (so a batch window cut here cannot split a tx).
  *
  *  - `pos` — feed byte position at the safe point
  *  - `sg` — shard GTID (incl. copy-phase lastpk) at the safe point
  *  - `epoch` — folded transaction epoch (A3/A4/A5)
  *  - `schemas` — latest FIELD wire line per table (schema checkpoint)
  *  - `hbMs` — interval-heartbeat baseline (commit-time ms)
  *  - `admitted` — transactions admitted beyond the fold's start GTID
  *    (cumulative since the fold was seeded)
  */
private[sources] final case class ShardCursor(
    pos: Long,
    sg: ShardGtid,
    epoch: Long,
    schemas: Map[String, String],
    hbMs: Long,
    admitted: Long)

/** The transaction-boundary fold over one shard's wire lines: tracks
  * BEGIN/COMMIT nesting, folds VGTID position + epoch transitions,
  * checkpoints FIELD (schema) lines, and mirrors the reader's
  * interval-heartbeat baseline rule — publishing a [[ShardCursor]] only
  * at out-of-transaction line boundaries, so any published cursor is a
  * safe batch cut. Single-threaded use; shared verbatim by the capped
  * synchronous scan and the background [[ShardTailer]], so the two
  * admission paths cannot drift.
  *
  * Prefix dispatch (only VGTID/FIELD/COMMIT lines are JSON-parsed)
  * keeps the fold cheap — most lines in a row-heavy stream are ROW
  * events the fold never parses.
  */
private[sources] final class TxBoundaryFold(
    shard: String,
    keyspace: String,
    seed: ShardCursor,
    startSg: ShardGtid,
    heartbeatIntervalMs: Long,
    splitBytes: Long = Long.MaxValue) {
  private var inTx = false
  private var txAdmitted = false
  private var lastSg = seed.sg
  private var epoch = seed.epoch
  private var tableSchemas = seed.schemas
  private var hbMs = seed.hbMs
  private var admitted = seed.admitted
  private var safeCursor = seed
  private var lastSplitPos = seed.pos
  private var splitAcc = Vector.empty[ShardCursor]

  /** Last transaction-safe cursor (== seed until the first safe line). */
  def safe: ShardCursor = safeCursor

  /** Intra-shard split cursors accrued since the last drain: one full
    * [[ShardCursor]] roughly every `splitBytes` of folded bytes, always
    * at a transaction-safe boundary — everything a partition reader
    * needs to start mid-shard (position, GTID, epoch, schema
    * checkpoint, heartbeat baseline), the exact contract a batch
    * boundary already has. Dropping a split cursor is always safe
    * (fewer, larger partitions), so consumers may filter freely. */
  def drainSplits(): Vector[ShardCursor] = {
    val out = splitAcc
    splitAcc = Vector.empty
    out
  }

  /** Fold one wire line; `posAfter` is the byte position just after it. */
  def onLine(line: String, posAfter: Long): Unit = {
    if (line.startsWith(FeedSlice.BeginPrefix)) { inTx = true; txAdmitted = false }
    else if (line.startsWith(FeedSlice.CommitPrefix)) {
      inTx = false
      if (heartbeatIntervalMs > 0 && txAdmitted) {
        VEventJson.read(line) match {
          case c: CommitEvent =>
            val tsMs = c.timestampSec * 1000L
            if (hbMs == Long.MinValue || tsMs - hbMs >= heartbeatIntervalMs) hbMs = tsMs
          case _ =>
        }
      }
      txAdmitted = false
    } else if (line.startsWith(FeedSlice.FieldPrefix)) {
      VEventJson.read(line) match {
        case f: FieldEvent => tableSchemas += (f.table -> line)
        case _ =>
      }
    } else if (line.startsWith(FeedSlice.VgtidPrefix)) {
      VEventJson.read(line) match {
        case VgtidEvent(_, v) =>
          v.shardGtid(shard).foreach { sg =>
            if (sg != lastSg) {
              if (CopyProgress.compare(sg, startSg) > 0) { admitted += 1; txAdmitted = true }
              if (sg.gtid != lastSg.gtid) {
                if (lastSg.gtid != Vgtid.EmptyGtid && lastSg.gtid != Vgtid.CurrentGtid)
                  epoch = EpochProvider.epochForGtid(epoch, lastSg.gtid, sg.gtid)
              }
              lastSg = sg.copy(keyspace = keyspace, shard = shard)
            }
          }
        case _ =>
      }
    }
    if (!inTx) {
      safeCursor = ShardCursor(posAfter, lastSg, epoch, tableSchemas, hbMs, admitted)
      if (safeCursor.pos - lastSplitPos >= splitBytes) {
        splitAcc :+= safeCursor
        lastSplitPos = safeCursor.pos
      }
    }
  }
}

/** Driver-side background consumer of one shard's stream: incrementally
  * reads new wire lines off the transport and folds them with
  * [[TxBoundaryFold]], publishing the latest transaction-safe cursor.
  *
  * This is what makes `latestOffset` metadata-only: the trigger thread
  * just snapshots the published cursor — O(1) per shard, no feed I/O —
  * instead of scanning every new byte itself; the scan work that
  * remains runs off the trigger path on a bounded [[TailerPool]].
  *
  * This mirrors the reference's architecture: its gRPC consumer thread
  * (VitessReplicationConnection.java:107-343) owns the stream and the
  * poll loop only drains a queue. A live gRPC transport's tailer is the
  * stream-observer callback itself — and can subscribe to a VGTID-only
  * filtered stream, making admission metadata-only end-to-end with the
  * data bytes flowing ONLY to executors.
  *
  * Threading: all mutable fold state is touched ONLY by the single pool
  * worker that owns this tailer (`step` is never called concurrently);
  * the trigger thread reads the volatile published snapshot.
  *
  * Catch-up barrier: `awaitCaughtUp(target)` blocks (bounded) until the
  * tailer has consumed through `target` — used by `latestOffset` so a
  * trigger observes data already durable when it fired, which keeps
  * `processAllAvailable` semantics and batch structure deterministic
  * for pre-written feeds. `drained` is published via a double-check
  * (size observed between two consecutive EOF reads) so it never claims
  * bytes the fold has not consumed.
  */
private[sources] final class ShardTailer(
    transport: VStreamTransport,
    locator: String,
    val shard: String,
    keyspace: String,
    seed: ShardCursor,
    startSg: ShardGtid,
    heartbeatIntervalMs: Long,
    splitBytes: Long = Long.MaxValue) {

  @volatile private var safeSnap: ShardCursor = seed
  // split cursors published by the worker BEFORE the snapshot they
  // precede, so a drain at snapshot time sees every split below it
  private val splitQueue = new java.util.concurrent.ConcurrentLinkedQueue[ShardCursor]()
  @volatile private var scanned: Long = seed.pos // consumed through (incl. in-tx lines)
  @volatile private var drained: Long = -1L // transport size fully consumed (EOF double-check)
  @volatile private var closed = false
  @volatile private var failure: Throwable = null

  // worker-thread only (lazily opened there, so tailer creation on the
  // trigger thread does no I/O at all)
  private var slice: VStreamSlice = null
  private var fold: TxBoundaryFold = null

  def snapshot: ShardCursor = safeSnap
  def isClosed: Boolean = closed

  /** Drain split cursors strictly below `endPos` (this batch's window);
    * anything at/after it is discarded — the worker may have folded past
    * the snapshot, and dropping a split is always safe. */
  def drainSplits(endPos: Long): Seq[ShardCursor] = {
    val out = Vector.newBuilder[ShardCursor]
    var c = splitQueue.poll()
    while (c != null) {
      if (c.pos < endPos) out += c
      c = splitQueue.poll()
    }
    out.result()
  }

  /** Block until the fold has consumed every complete line below
    * `target` (or the deadline passes — a torn trailing transaction can
    * legitimately hold the safe cursor back forever; the next trigger
    * picks it up once its COMMIT lands). A failed tailer rethrows here
    * so the query fails the way the old synchronous scan would have. */
  def awaitCaughtUp(target: Long, timeoutMs: Long, nudge: () => Unit): Unit = {
    if (target < 0) return // transport cannot report a size (push-style)
    nudge() // wake idle workers out of their backoff sleep
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (scanned < target && drained < target && failure == null && !closed &&
      System.nanoTime() < deadline) Thread.sleep(1)
    if (failure != null) throw new IllegalStateException(
      s"vitess-cdc tailer for shard $shard failed", failure)
  }

  /** Stop consuming; the owning worker prunes the tailer and closes its
    * slice on its own thread (no cross-thread channel close). */
  def shutdown(): Unit = closed = true

  /** Worker-thread only: consume up to `maxLines` new lines (the budget
    * keeps one hot shard from starving siblings on the same worker).
    * Returns whether any line was consumed. */
  def step(maxLines: Int): Boolean = {
    if (closed || failure != null) return false
    try {
      if (slice == null) {
        slice = transport.open(locator, seed.pos, Long.MaxValue)
        fold = new TxBoundaryFold(shard, keyspace, seed, startSg, heartbeatIntervalMs, splitBytes)
      }
      var n = 0
      var more = true
      while (more && n < maxLines) {
        val line = slice.readLine()
        if (line != null) { fold.onLine(line, slice.position); n += 1 }
        else if (n == 0) {
          // EOF double-check: only a size observed BETWEEN two EOF
          // reads is fully consumed (a line appended after the size
          // probe would surface on the re-read, not fall through)
          val d = transport.size(locator)
          val retry = slice.readLine()
          if (retry != null) { fold.onLine(retry, slice.position); n += 1 }
          else { if (d >= 0) drained = d; more = false }
        } else more = false
      }
      if (n > 0) {
        // publish order matters: `scanned` is the awaitCaughtUp gate, so
        // splits and the snapshot must be visible BEFORE it advances — a
        // trigger released by `scanned` must see everything below it
        fold.drainSplits().foreach(splitQueue.add)
        if (fold.safe ne safeSnap) safeSnap = fold.safe
        scanned = slice.position
      }
      n > 0
    } catch {
      case t: Throwable => if (!closed) failure = t; false
    }
  }

  /** Worker-thread (or post-shutdown pool) only. */
  private[sources] def closeSlice(): Unit = {
    if (slice != null) {
      try slice.close() catch { case _: Exception => () }
      slice = null
    }
  }
}

/** Bounded worker pool multiplexing shard tailers: at most `maxThreads`
  * daemon threads regardless of shard count (1000 shards must not mean
  * 1000 driver threads), each worker owning a fixed stripe of tailers —
  * so every tailer's fold stays single-threaded by construction. Idle
  * workers back off exponentially (pollMs → 50 ms) and are woken
  * immediately by `nudgeAll` when a trigger starts waiting, so the idle
  * cost is near zero without adding admission latency. */
private[sources] final class TailerPool(maxThreads: Int, pollMs: Long) {
  require(maxThreads > 0, "tail.threads must be positive")
  // per-pool id in the thread names: concurrently-running streams (and
  // their specs) can tell their own workers apart
  private[sources] val poolId: Long = TailerPool.ids.incrementAndGet()
  private val workers = scala.collection.mutable.ArrayBuffer.empty[Worker]
  private var next = 0
  @volatile private var stopped = false

  private[sources] def workerCount: Int = synchronized(workers.size)

  private final class Worker(idx: Int) extends Thread(s"vitess-cdc-tailer-$poolId-$idx") {
    setDaemon(true)
    val tailers = new java.util.concurrent.CopyOnWriteArrayList[ShardTailer]()
    private val lock = new Object
    @volatile private var nudged = false

    def nudge(): Unit = lock.synchronized { nudged = true; lock.notifyAll() }

    override def run(): Unit = {
      var idle = pollMs
      while (!stopped) {
        var progress = false
        tailers.forEach { t =>
          if (t.isClosed) { t.closeSlice(); tailers.remove(t); () }
          else if (t.step(maxLines = 256)) progress = true
        }
        if (progress) idle = pollMs
        else {
          // wait(0) would sleep forever — clamp to 1 ms; backoff caps at
          // 50 ms, or the configured poll interval when that is larger.
          // The flag is consumed INSIDE the lock: clearing it after the
          // synchronized block would erase a nudge that landed between
          // wait-return and the clear (lost wakeup → full-backoff sleep
          // while the trigger thread spins in awaitCaughtUp)
          lock.synchronized {
            if (!nudged && !stopped) lock.wait(math.max(1L, idle))
            nudged = false
          }
          idle = math.min(math.max(1L, idle * 2), math.max(50L, pollMs))
        }
      }
      tailers.forEach(_.closeSlice())
    }
  }

  def register(t: ShardTailer): Unit = synchronized {
    if (workers.size < maxThreads) {
      val w = new Worker(workers.size)
      w.tailers.add(t)
      w.start()
      workers += w
    } else {
      workers(next % workers.size).tailers.add(t)
      next += 1
    }
  }

  def nudgeAll(): Unit = synchronized { workers.foreach(_.nudge()) }

  def shutdown(): Unit = synchronized {
    stopped = true
    workers.foreach(_.nudge())
  }
}

private[sources] object TailerPool {
  private val ids = new java.util.concurrent.atomic.AtomicLong()
}
