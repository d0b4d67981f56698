package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core._
import java.util.Base64

/** E3: a raw value failed type conversion (carries the cause; thrown in
  * Fail mode, caught by the Skip-mode record drop). */
final class ConversionFailure(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

/** Stream-inferred schema registry: per-(shard, keyspace, table) column
  * metadata, last-writer-wins on every FIELD event (reference:
  * VitessDatabaseSchema.java:64-91). One instance per shard reader —
  * single-threaded by construction. */
final class SchemaRegistry(
    typeModes: ValueConversion.TypeModes = ValueConversion.TypeModes.default) {
  private var tables = Map.empty[TableRef, TableMeta]

  def update(shard: String, f: FieldEvent): TableMeta = {
    val (keyspace, table) = splitTableName(f.table, f.keyspace)
    val ref = TableRef(shard, keyspace, table)
    val decimalPrecise = typeModes.decimal == ValueConversion.DecimalMode.Precise
    val cols = f.fields.map { fd =>
      ColumnMeta.of(
        fd.name,
        GraftType.resolve(
          fd.wireType, fd.columnType, fd.columnLength, fd.decimals,
          f.enumSetStringValues, decimalPrecise),
        fd.flags)
    }
    val meta = TableMeta(ref, cols)
    // repeated identical FIELD events (the server resends one per copy
    // response batch) must return the EXISTING meta: every fresh
    // TableMeta instance would add an identity-keyed row to the reader's
    // key-index cache — an unbounded leak over a long copy phase
    tables.get(ref) match {
      case Some(prev) if prev == meta => prev
      case _ => tables += ref -> meta; meta
    }
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
  * against the registry schema.
  *
  * `vgtid` is the record's transaction position (the reference's
  * `source.vgtid` = currentVgtid, VitessSourceInfoStructMaker.java:36-44);
  * `restartVgtid` is the replay offset — the previous transaction's
  * position, so restarting from it replays this record's transaction
  * inclusively (SourceInfo.java:119-130, VitessOffsetContext.java:92-100).
  *
  * `totalOrder` counts all DML events in the transaction; `collectionOrder`
  * counts per-table within the transaction (reference
  * VitessOrderedTransactionStructMaker.java:39-50 + Debezium's
  * per-collection TransactionContext counters). Both are 1-based. */
final case class ChangeRecord(
    shard: String,
    keyspace: String,
    table: String, // bare table name
    op: String, // c / u / d / ddl / heartbeat / begin / end
    before: Option[String], // JSON object or null
    after: Option[String],
    key: Option[String], // JSON of PK (or first unique key) columns
    tsMs: Long,
    vgtid: String, // this transaction's VGTID JSON (source.vgtid)
    restartVgtid: String, // replay offset: previous transaction's VGTID JSON
    txId: Option[String],
    epoch: Long,
    rank: Option[String], // decimal string (sum can exceed Long)
    totalOrder: Long, // cross-table event order within tx, 1-based
    collectionOrder: Long) // per-table event order within tx, 1-based

/** Turns assembled transactions into envelope records: decodes packed
  * rows via the registry schema, computes per-transaction epoch + rank,
  * rotates the restart offset, and emits optional BEGIN/END boundary
  * records (reference: VitessChangeRecordEmitter.java:56-132,
  * VitessOrderedTransactionStructMaker.java:39-50, SourceInfo.java:105-130).
  * One instance per shard reader; `ctx` carries epoch state across
  * transactions. */
final class RecordBuilder(
    registry: SchemaRegistry,
    var ctx: OrderedTxContext,
    emitTransactionBoundaries: Boolean = false,
    initialVgtid: Option[Vgtid] = None,
    tableFilter: TableFilter = TableFilter.acceptAll,
    columnRules: ColumnRules = ColumnRules.none,
    convertFailureMode: ConvertFailureMode = ConvertFailureMode.Fail,
    snapshotTableFilter: Option[TableFilter] = None,
    typeModes: ValueConversion.TypeModes = ValueConversion.TypeModes.default) {

  private val mapper = new ObjectMapper()

  // Offset rotation state (reference SourceInfo.java:90-130). Records of
  // transaction N carry restartVgtid = position of transaction N-1; the
  // final boundary/commit position resets both to N.
  private var currentVgtid: Option[Vgtid] = initialVgtid
  private var restartVgtidOpt: Option[Vgtid] = initialVgtid

  /** rotateVgtid (SourceInfo.java:119-130): only when the new position
    * differs; a null/absent new position keeps the current one. */
  private def rotate(newVgtid: Option[Vgtid]): Unit =
    if (newVgtid != currentVgtid) {
      restartVgtidOpt = currentVgtid
      if (newVgtid.isDefined) currentVgtid = newVgtid
    }

  /** resetVgtid (SourceInfo.java:105-109): after all of a transaction's
    * events are produced, restart = current = that transaction's vgtid. */
  private def reset(v: Option[Vgtid]): Unit =
    if (v.isDefined) { restartVgtidOpt = v; currentVgtid = v }

  private def currentJson: String = currentVgtid.map(_.json).getOrElse("[]")
  private def restartJson: String = restartVgtidOpt.map(_.json).getOrElse("[]")

  def onTransaction(tx: VTransaction): Seq[ChangeRecord] = {
    val out = Vector.newBuilder[ChangeRecord]
    val tsMs = tx.commitTsSec * 1000L

    // Schema updates first — ROW events in the same transaction (copy
    // phase) need them.
    tx.events.foreach {
      case f: FieldEvent => { registry.update(tx.shard, f); () }
      case _ =>
    }

    val isDml = tx.events.exists(_.isInstanceOf[RowEvent])

    // BEGIN (or DDL/OTHER sendNow): rotate so records carry the previous
    // transaction's position as their restart offset (O1).
    rotate(tx.vgtid)
    val vgtidJson = currentJson

    val (epoch, rank) = (tx.vgtid, tx.txId) match {
      case (Some(v), Some(gtid)) if isDml =>
        val (next, e, r) = ctx.begin(tx.shard, v, gtid)
        ctx = next
        (e, Some(r.toString))
      case _ => (ctx.epochs.get(tx.shard).getOrElse(0L), None)
    }

    if (emitTransactionBoundaries && isDml)
      out += ChangeRecord(tx.shard, tx.keyspace, "", "begin", None, None, None,
        tsMs, vgtidJson, restartJson, tx.txId, epoch, rank, 0L, 0L)

    var totalOrder = 0L
    var perTableOrder = Map.empty[String, Long]
    tx.events.foreach {
      case r: RowEvent =>
        val (keyspace, table) = registry.splitTableName(r.table, r.keyspace)
        // F2 short-circuit: filtered tables skip column materialization
        // entirely (reference VStreamOutputMessageDecoder.java:188-201).
        // F3: during the copy phase (vgtid would trigger VStream copy),
        // the snapshot-table prefix filter additionally restricts which
        // tables are copied (reference Filters.java:39-48,
        // VitessReplicationConnection.java:308-312).
        val copyPhase = tx.vgtid.exists(_.willTriggerVStreamCopy)
        val snapshotOk = !copyPhase || snapshotTableFilter.forall(_.included(keyspace, table))
        if (tableFilter.included(keyspace, table) && snapshotOk) {
        val ref = TableRef(tx.shard, keyspace, table)
        val meta = registry.get(ref).getOrElse(
          throw new IllegalStateException(s"ROW for unknown table $ref (no FIELD seen)"))
        r.changes.foreach { change =>
          // E3 Skip mode drops the record on conversion failure; other
          // modes are handled per-column inside decodeValues
          val decoded =
            try {
              val beforeVals = change.before.map(decodeValues(meta, _))
              val afterVals = change.after.map(decodeValues(meta, _))
              Some((beforeVals, afterVals))
            } catch {
              case e: ConversionFailure if convertFailureMode == ConvertFailureMode.Skip =>
                None
            }
          decoded.foreach { case (beforeVals, afterVals) =>
            totalOrder += 1
            val collectionOrder = perTableOrder.getOrElse(ref.qualified, 0L) + 1
            perTableOrder += ref.qualified -> collectionOrder
            // the key extracts from the side already decoded — a row is
            // never decoded twice, and both JSONs stream straight out of
            // a generator with no intermediate tree
            out += ChangeRecord(
              tx.shard, keyspace, table, change.op,
              beforeVals.map(rowJson(meta, _)),
              afterVals.map(rowJson(meta, _)),
              keyFromValues(meta, afterVals.orElse(beforeVals).get),
              tsMs, vgtidJson, restartJson, tx.txId, epoch, rank, totalOrder, collectionOrder)
          }
        }
        }
      case d: DdlEvent =>
        val ex = DdlMetadata.extract(d.statement)
        val payload = mapper.createObjectNode()
        payload.put("statement", d.statement)
        payload.put("operation", ex.operation)
        payload.put("table", ex.table)
        out += ChangeRecord(tx.shard, d.keyspace, ex.table, "ddl",
          None, Some(mapper.writeValueAsString(payload)), None,
          tsMs, vgtidJson, restartJson, tx.txId, epoch, None, 0L, 0L)
      case h: HeartbeatEvent =>
        out += ChangeRecord(tx.shard, "", "", "heartbeat", None, None, None,
          tsMs, vgtidJson, restartJson, None, epoch, None, 0L, 0L)
      case _ => // BEGIN/COMMIT/FIELD/VGTID/OTHER/COPY_COMPLETED carry no payload
    }

    // COMMIT: all events produced — restart = current = this tx (O2). The
    // END boundary record is emitted after the reset (reference
    // VitessStreamingChangeEventSource.java:109-120), so its offset is
    // this transaction's own position.
    if (isDml) reset(tx.vgtid)

    if (emitTransactionBoundaries && isDml)
      out += ChangeRecord(tx.shard, tx.keyspace, "", "end", None, None, None,
        tsMs, vgtidJson, restartJson, tx.txId, epoch, rank, totalOrder, 0L)

    out.result()
  }

  /** Decode one packed row against the table schema into JSON-writable
    * values, one slot per schema column: a boxed number / Boolean /
    * String, Scala null for SQL NULL, or the [[RecordBuilder.Dropped]]
    * sentinel for columns the serializers must omit. Column-count
    * mismatch = hard error (reference:
    * VStreamOutputMessageDecoder.java:303-309). Decoding ONCE into a
    * flat array (instead of a Jackson tree) lets the after JSON and the
    * key JSON both stream straight out of a generator — the envelope
    * build is the decode hot path's biggest cost. */
  private def decodeValues(meta: TableMeta, row: PackedRow): Array[AnyRef] = {
    val raw = row.slice
    require(raw.size == meta.columns.size,
      s"row has ${raw.size} columns, schema ${meta.ref} has ${meta.columns.size}")
    val out = new Array[AnyRef](raw.size)
    var idx = 0
    meta.columns.zip(raw).foreach { case (col, bytes) =>
      // unknown-typed fields are omitted unless include.unknown.datatypes
      // is set (reference default: resolver drops the field rather than
      // emitting an implementation-defined binary form) — EXCEPT primary
      // key columns: the key JSON reads from this output, and omitting a
      // PK column would collapse every row of the table to one key
      // (silent loss through materialize); an opaque-binary key stays
      // distinct
      val dropUnknown =
        col.graftType == GraftType.Unknown && !typeModes.includeUnknown &&
          !col.primaryKey
      if (dropUnknown ||
        columnRules.isExcluded(meta.ref.keyspace, meta.ref.table, col.name)) {
        out(idx) = RecordBuilder.Dropped
      } else {
      val decoded =
        try ValueConversion.decode(
          col.graftType, bytes.orNull,
          typeModes.uint64, typeModes.binary, typeModes.temporal, typeModes.decimal)
        catch {
          case scala.util.control.NonFatal(e) => convertFailureMode match {
            case ConvertFailureMode.Fail =>
              throw new ConversionFailure(
                s"cannot convert column ${col.name} of ${meta.ref}: ${e.getMessage}", e)
            case ConvertFailureMode.Warn => None // null the column, continue
            case ConvertFailureMode.Skip =>
              throw new ConversionFailure(s"skip record: column ${col.name}", e)
          }
        }
      // zero-date sentinel collapsed on a NOT NULL column → epoch fallback
      // (reference: null only for optional columns), unless the
      // override.datetime.to.nullable mode forces NULL through
      val withFallback =
        if (decoded.isEmpty && bytes.isDefined && !col.optional &&
          !typeModes.datetimeToNullable)
          ValueConversion.epochFallback(col.graftType)
        else decoded
      out(idx) = withFallback match {
        case None => null // SQL NULL
        case Some(v) => v match {
          case s: String =>
            columnRules.transformString(meta.ref.keyspace, meta.ref.table, col.name, s)
          case b: Array[Byte] => Base64.getEncoder.encodeToString(b)
          case bd: BigDecimal => bd.bigDecimal
          case s: Short      => java.lang.Short.valueOf(s)
          case i: Int        => java.lang.Integer.valueOf(i)
          case l: Long       => java.lang.Long.valueOf(l)
          case f: Float      => java.lang.Float.valueOf(f)
          case d: Double     => java.lang.Double.valueOf(d)
          case b: Boolean    => java.lang.Boolean.valueOf(b)
          case d: java.time.LocalDate => d.toString
          case dt: java.time.LocalDateTime => dt.toString
          case other => other.toString
        }
      }
      }
      idx += 1
    }
    out
  }

  private def writeField(
      g: com.fasterxml.jackson.core.JsonGenerator, name: String, v: AnyRef): Unit = v match {
    // the generator emits byte-identical JSON to Jackson's node
    // serializers (ShortNode/LongNode/… all call these writeNumber
    // overloads), so oracle hashes are unaffected by the tree removal
    case null => g.writeNullField(name)
    case s: String => g.writeStringField(name, s)
    case l: java.lang.Long => g.writeNumberField(name, l.longValue())
    case i: java.lang.Integer => g.writeNumberField(name, i.intValue())
    case sh: java.lang.Short => g.writeFieldName(name); g.writeNumber(sh.shortValue())
    case f: java.lang.Float => g.writeNumberField(name, f.floatValue())
    case d: java.lang.Double => g.writeNumberField(name, d.doubleValue())
    case b: java.lang.Boolean => g.writeBooleanField(name, b.booleanValue())
    case bd: java.math.BigDecimal => g.writeNumberField(name, bd)
    case other => g.writeStringField(name, other.toString)
  }

  /** after/before JSON: every non-dropped column, schema order. */
  private def rowJson(meta: TableMeta, values: Array[AnyRef]): String = {
    val sw = new java.io.StringWriter(values.length * 16)
    val g = mapper.getFactory.createGenerator(sw)
    g.writeStartObject()
    var i = 0
    val cols = meta.columns
    while (i < values.length) {
      if (values(i).asInstanceOf[AnyRef] ne RecordBuilder.Dropped)
        writeField(g, cols(i).name, values(i))
      i += 1
    }
    g.writeEndObject()
    g.close()
    sw.toString
  }

  // key-column indices memoized per schema instance (LWW registry swaps
  // the TableMeta object on evolution, so identity keying is exact)
  private val keyIdxCache =
    new java.util.IdentityHashMap[TableMeta, Array[Int]]()
  private def keyIndices(meta: TableMeta): Array[Int] = {
    val cached = keyIdxCache.get(meta)
    if (cached != null) cached
    else {
      val idx = meta.keyColumns.map(k => meta.columns.indexWhere(_.name == k)).toArray
      keyIdxCache.put(meta, idx)
      idx
    }
  }

  /** Key JSON from the ALREADY-decoded values (PK columns are never
    * dropped by the unknown-type rule; a rule-excluded key column
    * serializes as null, as it always has). */
  private def keyFromValues(meta: TableMeta, values: Array[AnyRef]): Option[String] = {
    val idx = keyIndices(meta)
    if (idx.isEmpty) return None
    val sw = new java.io.StringWriter(32)
    val g = mapper.getFactory.createGenerator(sw)
    g.writeStartObject()
    idx.foreach { i =>
      val v = values(i)
      if (v.asInstanceOf[AnyRef] eq RecordBuilder.Dropped)
        g.writeNullField(meta.columns(i).name)
      else writeField(g, meta.columns(i).name, v)
    }
    g.writeEndObject()
    g.close()
    Some(sw.toString)
  }
}

object RecordBuilder {
  /** Column-omitted sentinel inside a decoded values array. */
  private[streaming] object Dropped
}
