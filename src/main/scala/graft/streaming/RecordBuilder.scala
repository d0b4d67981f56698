package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core._
import java.util.Base64

/** Stream-inferred schema registry: per-(shard, keyspace, table) column
  * metadata, last-writer-wins on every FIELD event (reference:
  * VitessDatabaseSchema.java:64-91). One instance per shard reader —
  * single-threaded by construction. */
final class SchemaRegistry {
  private var tables = Map.empty[TableRef, TableMeta]

  def update(shard: String, f: FieldEvent): TableMeta = {
    val (keyspace, table) = splitTableName(f.table, f.keyspace)
    val ref = TableRef(shard, keyspace, table)
    val cols = f.fields.map { fd =>
      ColumnMeta.of(
        fd.name,
        GraftType.resolve(fd.wireType, fd.columnType, fd.columnLength, fd.decimals, f.enumSetStringValues),
        fd.flags)
    }
    val meta = TableMeta(ref, cols)
    tables += ref -> meta
    meta
  }

  def get(ref: TableRef): Option[TableMeta] = tables.get(ref)
  def all: Map[TableRef, TableMeta] = tables

  /** Wire table names are `keyspace.table`, or bare when the server runs
    * with exclude-keyspace (reference:
    * VStreamOutputMessageDecoder.java:379-400). */
  def splitTableName(qualified: String, fallbackKeyspace: String): (String, String) = {
    val dot = qualified.indexOf('.')
    if (dot >= 0) (qualified.substring(0, dot), qualified.substring(dot + 1))
    else (fallbackKeyspace, qualified)
  }
}

/** One change record in the engine's stable envelope schema. The payload
  * rides as JSON keyed by column name (design (b) of SURVEY §1.3: one
  * stream, dynamic tables) and is re-typed per table with `from_json`
  * against the registry schema. */
final case class ChangeRecord(
    shard: String,
    keyspace: String,
    table: String, // bare table name
    op: String, // c / u / d / ddl / heartbeat / begin / end
    before: Option[String], // JSON object or null
    after: Option[String],
    key: Option[String], // JSON of PK (or first unique key) columns
    tsMs: Long,
    vgtid: String, // full VGTID JSON at this record's transaction
    txId: Option[String],
    epoch: Long,
    rank: Option[String], // decimal string (sum can exceed Long)
    orderInTx: Long) // data_collection_order analogue, 1-based

/** Turns assembled transactions into envelope records: decodes packed
  * rows via the registry schema, computes per-transaction epoch + rank,
  * and emits optional BEGIN/END boundary records (reference:
  * VitessChangeRecordEmitter.java:56-132,
  * VitessOrderedTransactionStructMaker.java:39-50). One instance per
  * shard reader; `ctx` carries epoch state across transactions. */
final class RecordBuilder(
    registry: SchemaRegistry,
    var ctx: OrderedTxContext,
    emitTransactionBoundaries: Boolean = false) {

  private val mapper = new ObjectMapper()

  def onTransaction(tx: VTransaction): Seq[ChangeRecord] = {
    val out = Vector.newBuilder[ChangeRecord]
    val vgtidJson = tx.vgtid.map(_.json).getOrElse("[]")
    val tsMs = tx.commitTsSec * 1000L

    // Schema updates first — ROW events in the same transaction (copy
    // phase) need them.
    tx.events.foreach {
      case f: FieldEvent => { registry.update(tx.shard, f); () }
      case _ =>
    }

    val isDml = tx.events.exists(_.isInstanceOf[RowEvent])
    val (epoch, rank) = (tx.vgtid, tx.txId) match {
      case (Some(v), Some(gtid)) if isDml =>
        val (next, e, r) = ctx.begin(tx.shard, v, gtid)
        ctx = next
        (e, Some(r.toString))
      case _ => (ctx.epochs.get(tx.shard).getOrElse(0L), None)
    }

    if (emitTransactionBoundaries && isDml)
      out += ChangeRecord(tx.shard, tx.keyspace, "", "begin", None, None, None,
        tsMs, vgtidJson, tx.txId, epoch, rank, 0L)

    var order = 0L
    tx.events.foreach {
      case r: RowEvent =>
        val (keyspace, table) = registry.splitTableName(r.table, r.keyspace)
        val ref = TableRef(tx.shard, keyspace, table)
        val meta = registry.get(ref).getOrElse(
          throw new IllegalStateException(s"ROW for unknown table $ref (no FIELD seen)"))
        r.changes.foreach { change =>
          order += 1
          val beforeJson = change.before.map(decodeToJson(meta, _))
          val afterJson = change.after.map(decodeToJson(meta, _))
          out += ChangeRecord(
            tx.shard, keyspace, table, change.op,
            beforeJson, afterJson,
            keyJson(meta, change.after.orElse(change.before).get),
            tsMs, vgtidJson, tx.txId, epoch, rank, order)
        }
      case d: DdlEvent =>
        val ex = DdlMetadata.extract(d.statement)
        val payload = mapper.createObjectNode()
        payload.put("statement", d.statement)
        payload.put("operation", ex.operation)
        payload.put("table", ex.table)
        out += ChangeRecord(tx.shard, d.keyspace, ex.table, "ddl",
          None, Some(mapper.writeValueAsString(payload)), None,
          tsMs, vgtidJson, tx.txId, epoch, None, 0L)
      case h: HeartbeatEvent =>
        out += ChangeRecord(tx.shard, "", "", "heartbeat", None, None, None,
          tsMs, vgtidJson, None, epoch, None, 0L)
      case _ => // BEGIN/COMMIT/FIELD/VGTID/OTHER/COPY_COMPLETED carry no payload
    }

    if (emitTransactionBoundaries && isDml)
      out += ChangeRecord(tx.shard, tx.keyspace, "", "end", None, None, None,
        tsMs, vgtidJson, tx.txId, epoch, rank, order)

    out.result()
  }

  /** Decode one packed row against the table schema into a JSON object
    * keyed by column name. Column-count mismatch = hard error (reference:
    * VStreamOutputMessageDecoder.java:303-309). */
  private def decodeToJson(meta: TableMeta, row: PackedRow): String = {
    val raw = row.slice
    require(raw.size == meta.columns.size,
      s"row has ${raw.size} columns, schema ${meta.ref} has ${meta.columns.size}")
    val o = mapper.createObjectNode()
    meta.columns.zip(raw).foreach { case (col, bytes) =>
      ValueConversion.decode(col.graftType, bytes.orNull) match {
        case None => o.putNull(col.name)
        case Some(v) => v match {
          case s: Short      => o.put(col.name, s)
          case i: Int        => o.put(col.name, i)
          case l: Long       => o.put(col.name, l)
          case f: Float      => o.put(col.name, f)
          case d: Double     => o.put(col.name, d)
          case b: Boolean    => o.put(col.name, b)
          case bd: BigDecimal => o.put(col.name, bd.bigDecimal)
          case s: String     => o.put(col.name, s)
          case b: Array[Byte] => o.put(col.name, Base64.getEncoder.encodeToString(b))
          case d: java.time.LocalDate => o.put(col.name, d.toString)
          case dt: java.time.LocalDateTime => o.put(col.name, dt.toString)
          case other => o.put(col.name, other.toString)
        }
      }
    }
    mapper.writeValueAsString(o)
  }

  private def keyJson(meta: TableMeta, row: PackedRow): Option[String] = {
    val keys = meta.keyColumns
    if (keys.isEmpty) return None
    val full = mapper.readTree(decodeToJson(meta, row))
    val o = mapper.createObjectNode()
    keys.foreach { k => o.set[com.fasterxml.jackson.databind.JsonNode](k, full.get(k)); () }
    Some(mapper.writeValueAsString(o))
  }
}
