package graft.streaming

import graft.core.Vgtid

/** One complete BEGIN…COMMIT unit (or an immediately-flushed DDL /
  * HEARTBEAT / OTHER event) with the VGTID observed inside it. */
final case class VTransaction(
    shard: String,
    keyspace: String,
    vgtid: Option[Vgtid],
    events: Seq[VEvent],
    commitTsSec: Long) {

  /** The transaction id is this shard's GTID at the transaction's VGTID. */
  def txId: Option[String] = vgtid.flatMap(_.shardGtid(shard)).map(_.gtid)
}

/** Buffers a per-shard event feed into complete transactions, enforcing
  * the reference's ordering invariants (reference:
  * src/main/java/io/debezium/connector/vitess/connection/
  * VitessReplicationConnection.java:128-300):
  *
  *  - a transaction spans BEGIN … COMMIT and may span multiple responses;
  *  - BEGIN while a transaction is open is an error, EXCEPT the copy-phase
  *    patterns `BEGIN,FIELD[,VGTID]` / `COPY_COMPLETED,BEGIN,FIELD[,VGTID]`
  *    where the server restarts the transaction (`:166-203`);
  *  - COMMIT without an open transaction is an error (`:290-299`);
  *  - DDL / OTHER / HEARTBEAT outside a transaction flush immediately
  *    (`sendNow`, `:206-218`);
  *  - a trailing unterminated buffer is dropped (never emitted).
  *
  * Pure: single-shard, deterministic, no Spark dependency — it runs
  * inside the source's partition reader (one instance per shard).
  */
object TransactionAssembler {

  def assemble(events: Iterator[VEvent]): Iterator[VTransaction] =
    new Iterator[VTransaction] {
      private var buffer = Vector.empty[VEvent]
      private var inTx = false
      private var txVgtid: Option[Vgtid] = None
      private var lastVgtid: Option[Vgtid] = None
      private var pending: Option[VTransaction] = None

      private def copyPhaseRestart: Boolean = {
        // events since the open BEGIN must all be FIELD / VGTID / COPY_COMPLETED
        val sinceBegin = buffer.drop(buffer.lastIndexWhere(_.isInstanceOf[BeginEvent]) + 1)
        sinceBegin.forall {
          case _: FieldEvent | _: VgtidEvent | _: CopyCompletedEvent => true
          case _ => false
        }
      }

      private def step(e: VEvent): Option[VTransaction] = e match {
        case b: BeginEvent =>
          if (inTx && !copyPhaseRestart)
            throw new IllegalStateException(
              s"BEGIN while transaction open on shard ${b.shard} (not a copy-phase restart)")
          inTx = true
          buffer :+= b
          None
        case c: CommitEvent =>
          if (!inTx)
            throw new IllegalStateException(s"COMMIT without BEGIN on shard ${c.shard}")
          val tx = VTransaction(c.shard, c.keyspace, txVgtid.orElse(lastVgtid), buffer :+ c, c.timestampSec)
          buffer = Vector.empty; inTx = false; txVgtid = None
          Some(tx)
        case v: VgtidEvent =>
          lastVgtid = Some(v.vgtid)
          if (inTx) { txVgtid = Some(v.vgtid); buffer :+= v; None }
          else None // bare VGTID between transactions just advances position
        case d: DdlEvent =>
          // DDL is transaction-terminating on the server side; flush now
          Some(VTransaction(d.shard, d.keyspace, lastVgtid, Vector(d), 0L))
        case h: HeartbeatEvent =>
          if (inTx) { buffer :+= h; None }
          else Some(VTransaction(h.shard, "", lastVgtid, Vector(h), 0L))
        case o: OtherEvent =>
          if (inTx) { buffer :+= o; None }
          else Some(VTransaction(o.shard, "", lastVgtid, Vector(o), 0L))
        case f: FieldEvent =>
          if (inTx) { buffer :+= f; None }
          // standalone FIELD still carries a schema update; flush it alone
          else Some(VTransaction(f.shard, f.keyspace, lastVgtid, Vector(f), 0L))
        case r: RowEvent =>
          if (!inTx)
            throw new IllegalStateException(s"ROW outside transaction on shard ${r.shard}")
          buffer :+= r
          None
        case cc: CopyCompletedEvent =>
          if (inTx) buffer :+= cc
          None
      }

      def hasNext: Boolean = {
        while (pending.isEmpty && events.hasNext) pending = step(events.next())
        pending.nonEmpty
      }

      def next(): VTransaction = {
        if (!hasNext) throw new NoSuchElementException
        val t = pending.get
        pending = None
        t
      }
    }
}
