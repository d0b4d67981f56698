package graft.sources

import graft.core._
import graft.streaming._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Wire-robustness property suite for the hand-rolled [[VtWire]] codec.
  *
  * A real vtgate (Go protobuf encoder, or any conforming implementation)
  * may emit message fields in ANY order and may include fields this
  * decoder has never heard of (newer vitess additions). Protobuf
  * semantics require a decoder to accept both: only the relative order
  * of REPEATED occurrences of the same field is significant, and unknown
  * tags must be skipped by wire type. This spec pins those two
  * properties over ≥1k randomly generated messages: it re-encodes
  * VtWire's own bytes through a schema-driven mangler that (a) permutes
  * sibling fields at every message level while preserving per-field
  * repeated order, and (b) injects unknown fields of every non-group
  * wire type at random positions — then asserts decode(mangled) ==
  * decode(clean).
  */
class VtWireFuzzSpec extends AnyFunSuite {

  // ------------------------------------------------------------------
  // minimal raw-protobuf chunk surgery (test-side only)
  // ------------------------------------------------------------------

  /** One top-level field occurrence: (field number, wire type, payload
    * bytes WITHOUT tag/length framing; for wt=2 the payload is the
    * unframed bytes, for scalar wts the raw encoded scalar). */
  private type Chunk = (Int, Int, Array[Byte])

  private def readVarint(b: Array[Byte], at: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var i = at
    while ({ v |= (b(i) & 0x7FL) << shift; shift += 7; (b(i) & 0x80) != 0 }) i += 1
    (v, i + 1)
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def parseChunks(bytes: Array[Byte]): Vector[Chunk] = {
    val chunks = Vector.newBuilder[Chunk]
    var i = 0
    while (i < bytes.length) {
      val (tag, afterTag) = readVarint(bytes, i)
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      wt match {
        case 0 =>
          val (_, end) = readVarint(bytes, afterTag)
          chunks += ((num, wt, bytes.slice(afterTag, end))); i = end
        case 1 =>
          chunks += ((num, wt, bytes.slice(afterTag, afterTag + 8))); i = afterTag + 8
        case 2 =>
          val (len, afterLen) = readVarint(bytes, afterTag)
          val end = afterLen + len.toInt
          chunks += ((num, wt, bytes.slice(afterLen, end))); i = end
        case 5 =>
          chunks += ((num, wt, bytes.slice(afterTag, afterTag + 4))); i = afterTag + 4
        case other => fail(s"unexpected wire type $other in VtWire output")
      }
    }
    chunks.result()
  }

  private def encodeChunks(chunks: Seq[Chunk]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    chunks.foreach { case (num, wt, payload) =>
      writeVarint(out, (num.toLong << 3) | wt)
      if (wt == 2) writeVarint(out, payload.length.toLong)
      out.write(payload)
    }
    out.toByteArray
  }

  /** Permute sibling chunks while preserving the relative order of
    * repeated occurrences of the SAME field number (the only order
    * protobuf guarantees — and the only one the engine relies on, e.g.
    * event order inside VStreamResponse). */
  private def stableShuffle(chunks: Vector[Chunk], rnd: Random): Vector[Chunk] = {
    val positions = rnd.shuffle(chunks.indices.toVector)
    val slots = positions.map(chunks)
    val queues = scala.collection.mutable.Map[Int, scala.collection.mutable.Queue[Chunk]]()
    chunks.foreach { c =>
      queues.getOrElseUpdate(c._1, scala.collection.mutable.Queue.empty) += c
    }
    slots.map { case (num, _, _) => queues(num).dequeue() }
  }

  /** Inject 0..3 unknown fields (numbers 100..199 outside the node's
    * known set; wire types varint/fixed64/bytes/fixed32) at random
    * positions. */
  private def injectUnknown(chunks: Vector[Chunk], known: Set[Int], rnd: Random): Vector[Chunk] = {
    val extra = (0 until rnd.nextInt(4)).map { _ =>
      var num = 0
      while (num == 0 || known.contains(num)) num = 100 + rnd.nextInt(100)
      rnd.nextInt(4) match {
        case 0 =>
          val out = new java.io.ByteArrayOutputStream()
          writeVarint(out, rnd.nextLong() & Long.MaxValue)
          (num, 0, out.toByteArray)
        case 1 => (num, 1, Array.fill(8)(rnd.nextInt().toByte))
        case 2 => (num, 2, Array.fill(rnd.nextInt(20))(rnd.nextInt().toByte))
        case _ => (num, 5, Array.fill(4)(rnd.nextInt().toByte))
      }
    }
    extra.foldLeft(chunks) { (acc, c) =>
      val at = rnd.nextInt(acc.length + 1)
      (acc.take(at) :+ c) ++ acc.drop(at)
    }
  }

  /** Message-tree schema (field → submessage) mirroring the public
    * .proto layout documented in VtWire's header. `known` lists every
    * field number the decoder consumes at that level, so injected
    * unknowns never collide with a real field. Leaf length-delimited
    * fields (strings, packed lengths, value bytes) are never recursed. */
  private final case class Node(known: Set[Int], children: Map[Int, Node])

  private val rowNode = Node(Set(1, 2), Map.empty) // lengths (packed), values
  private val fieldNode = Node(Set(1, 2, 7, 8, 9, 10, 11), Map.empty)
  private val rowChangeNode = Node(Set(1, 2), Map(1 -> rowNode, 2 -> rowNode))
  private val rowEventNode = Node(Set(1, 2, 3, 4), Map(2 -> rowChangeNode))
  private val fieldEventNode = Node(Set(1, 2, 3, 4, 25), Map(2 -> fieldNode))
  private val queryResultNode = Node(Set(1, 2, 3, 4), Map(1 -> fieldNode, 4 -> rowNode))
  private val lastPkNode = Node(Set(1, 3), Map(3 -> queryResultNode))
  private val shardGtidNode = Node(Set(1, 2, 3, 4), Map(4 -> lastPkNode))
  private val vgtidNode = Node(Set(1), Map(1 -> shardGtidNode))
  private val eventNode = Node(
    Set(1, 2, 4, 5, 6, 7, 20, 22, 23),
    Map(5 -> rowEventNode, 6 -> fieldEventNode, 7 -> vgtidNode))
  private val responseNode = Node(Set(1), Map(1 -> eventNode))
  private val ruleNode = Node(Set(1, 2), Map.empty)
  private val filterNode = Node(Set(1), Map(1 -> ruleNode))
  private val flagsNode = Node(Set(1, 2, 3, 4, 5, 6, 7, 8, 9, 10), Map.empty)
  private val requestNode = Node(
    Set(1, 2, 3, 4, 5),
    Map(3 -> vgtidNode, 4 -> filterNode, 5 -> flagsNode))
  private val sessionNode = Node(Set(4, 5), Map.empty)
  private val boundQueryNode = Node(Set(1), Map.empty)
  private val executeRequestNode = Node(
    Set(1, 2, 3), Map(2 -> sessionNode, 3 -> boundQueryNode))
  private val rpcErrorNode = Node(Set(1, 2), Map.empty)
  private val executeResponseNode = Node(
    Set(1, 2, 3), Map(1 -> rpcErrorNode, 3 -> queryResultNode))

  private def mangle(bytes: Array[Byte], node: Node, rnd: Random): Array[Byte] = {
    val recursed = parseChunks(bytes).map {
      case (num, 2, payload) if node.children.contains(num) =>
        (num, 2, mangle(payload, node.children(num), rnd))
      case other => other
    }
    encodeChunks(stableShuffle(injectUnknown(recursed, node.known, rnd), rnd))
  }

  // ------------------------------------------------------------------
  // random model generators
  // ------------------------------------------------------------------

  private def word(rnd: Random): String =
    (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  private def randomRow(rnd: Random): PackedRow =
    PackedRow.of((0 until 1 + rnd.nextInt(3)).map { _ =>
      if (rnd.nextInt(4) == 0) None else Some(word(rnd))
    })

  private def randomFields(rnd: Random): Seq[FieldDef] =
    (0 until 1 + rnd.nextInt(3)).map { i =>
      FieldDef(s"c$i", if (rnd.nextBoolean()) "INT64" else "VARCHAR",
        "varchar(64)", rnd.nextInt(256), 0, rnd.nextInt(4).toLong)
    }

  private def randomLastPk(rnd: Random): TableLastPk =
    TableLastPk(
      word(rnd),
      Seq(PkField("id", "INT64", rnd.nextInt(64), Some(1 + rnd.nextInt(1 << 16)))),
      Seq(PkRow(Seq("2"),
        java.util.Base64.getEncoder.encodeToString(word(rnd).getBytes))))

  private def randomVgtid(rnd: Random): Vgtid =
    Vgtid((0 until 1 + rnd.nextInt(3)).map { i =>
      ShardGtid("ks", s"s$i", s"MySQL56/x:1-${rnd.nextInt(1000)}",
        if (rnd.nextInt(3) == 0) Seq(randomLastPk(rnd)) else Nil)
    })

  private def randomEvent(rnd: Random): VEvent = {
    val shard = s"s${rnd.nextInt(4)}"
    rnd.nextInt(9) match {
      case 0 => BeginEvent(shard, "ks")
      case 1 => CommitEvent(shard, "ks", 1700000000L + rnd.nextInt(100000))
      case 2 => FieldEvent(shard, "ks", s"ks.${word(rnd)}", randomFields(rnd), rnd.nextBoolean())
      case 3 => RowEvent(shard, "ks", s"ks.${word(rnd)}",
        (0 until 1 + rnd.nextInt(3)).map { _ =>
          rnd.nextInt(3) match {
            case 0 => RowChange(None, Some(randomRow(rnd)))
            case 1 => RowChange(Some(randomRow(rnd)), Some(randomRow(rnd)))
            case _ => RowChange(Some(randomRow(rnd)), None)
          }
        })
      case 4 => VgtidEvent(shard, randomVgtid(rnd))
      case 5 => DdlEvent(shard, "ks", s"ALTER TABLE ${word(rnd)} ADD c INT",
        1700000000L + rnd.nextInt(100000))
      case 6 => HeartbeatEvent(shard)
      case 7 => CopyCompletedEvent(shard)
      case _ => OtherEvent(shard)
    }
  }

  // ------------------------------------------------------------------
  // properties
  // ------------------------------------------------------------------

  test("decode is invariant under field reordering + unknown fields: VStreamResponse") {
    val rnd = new Random(0x5EEDL)
    (1 to 1200).foreach { trial =>
      val events = (0 until 1 + rnd.nextInt(6)).map(_ => randomEvent(rnd))
      val clean = VtWire.encodeVStreamResponse(events)
      val mangled = mangle(clean, responseNode, rnd)
      val decodedClean = VtWire.decodeVStreamResponse(clean)
      val decodedMangled = VtWire.decodeVStreamResponse(mangled)
      assert(decodedMangled == decodedClean, s"trial $trial diverged")
      // and the clean decode really is the original model (round-trip)
      assert(decodedClean == events, s"trial $trial round-trip broke")
    }
  }

  test("decode is invariant under field reordering + unknown fields: VStreamRequest") {
    val rnd = new Random(0x77L)
    (1 to 400).foreach { trial =>
      val model = VtWire.VStreamRequestModel(
        tabletType = 1 + rnd.nextInt(3),
        vgtid = randomVgtid(rnd),
        rules = (0 until rnd.nextInt(3)).map(i => s"t$i" -> s"select * from `t$i`"),
        flags = VtWire.VStreamFlagsModel(
          minimizeSkew = rnd.nextBoolean(),
          heartbeatIntervalSec = rnd.nextInt(60),
          stopOnReshard = rnd.nextBoolean(),
          cells = if (rnd.nextBoolean()) "zone1,zone2" else "",
          cellPreference = if (rnd.nextBoolean()) "preferred" else "",
          tabletOrder = if (rnd.nextBoolean()) "REPLICA,RDONLY" else "",
          streamKeyspaceHeartbeats = rnd.nextBoolean(),
          includeReshardJournalEvents = rnd.nextBoolean(),
          excludeKeyspaceFromTableName = rnd.nextBoolean(),
          tablesToCopy = (0 until rnd.nextInt(3)).map(i => s"t$i")))
      val clean = VtWire.encodeVStreamRequest(model)
      val mangled = mangle(clean, requestNode, rnd)
      assert(VtWire.decodeVStreamRequest(mangled) == VtWire.decodeVStreamRequest(clean),
        s"trial $trial diverged")
      assert(VtWire.decodeVStreamRequest(clean) == model, s"trial $trial round-trip broke")
    }
  }

  test("decode is invariant under field reordering + unknown fields: Execute RPC") {
    val rnd = new Random(0xE8EC47EL)
    (1 to 400).foreach { trial =>
      val req = VtWire.ExecuteRequestModel(
        sql = s"SHOW TABLES /* ${word(rnd)} */",
        targetString = if (rnd.nextBoolean()) s"ks:s${rnd.nextInt(4)}@replica" else "",
        autocommit = rnd.nextBoolean())
      val cleanReq = VtWire.encodeExecuteRequest(req)
      assert(VtWire.decodeExecuteRequest(mangle(cleanReq, executeRequestNode, rnd)) ==
        VtWire.decodeExecuteRequest(cleanReq), s"trial $trial request diverged")
      assert(VtWire.decodeExecuteRequest(cleanReq) == req, s"trial $trial request round-trip")

      val resp = VtWire.ExecuteResponseModel(
        error = if (rnd.nextInt(4) == 0) Some(s"err ${word(rnd)}") else None,
        result = if (rnd.nextInt(4) == 0) None else Some(VtWire.QueryResultModel(
          randomFields(rnd),
          (0 until rnd.nextInt(4)).map(_ => randomRow(rnd)))))
      val cleanResp = VtWire.encodeExecuteResponse(resp)
      assert(VtWire.decodeExecuteResponse(mangle(cleanResp, executeResponseNode, rnd)) ==
        VtWire.decodeExecuteResponse(cleanResp), s"trial $trial response diverged")
      assert(VtWire.decodeExecuteResponse(cleanResp) == resp, s"trial $trial response round-trip")
    }
  }

  // ------------------------------------------------------------------
  // hand-crafted conformance cases the random fuzz never reaches
  // ------------------------------------------------------------------

  /** Raw message builder: length-delimited submessage field. */
  private def sub(field: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeVarint(out, (field.toLong << 3) | 2)
    writeVarint(out, body.length.toLong)
    out.write(body)
    out.toByteArray
  }
  private def varintField(field: Int, value: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeVarint(out, (field.toLong << 3) | 0)
    writeVarint(out, value)
    out.toByteArray
  }
  private def strField(field: Int, s: String): Array[Byte] = sub(field, s.getBytes("UTF-8"))
  private def cat(parts: Array[Byte]*): Array[Byte] = parts.reduce(_ ++ _)
  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  test("unpacked Row.lengths decodes identically to the packed form") {
    // protobuf conformance: repeated scalars must decode in BOTH the
    // packed and the one-varint-per-element encodings
    def rowMsg(packed: Boolean): Array[Byte] = {
      val lens = Seq(3L, -1L, 1L)
      val lengthsBytes =
        if (packed) {
          val body = new java.io.ByteArrayOutputStream()
          lens.foreach(l => writeVarint(body, zigzag(l)))
          sub(1, body.toByteArray)
        } else cat(lens.map(l => varintField(1, zigzag(l))): _*)
      cat(lengthsBytes, sub(2, "abcx".getBytes("UTF-8")))
    }
    def event(row: Array[Byte]): Array[Byte] = {
      val rowChange = sub(2, row) // RowChange.after = 2
      val rowEvent = cat(strField(1, "ks.t"), sub(2, rowChange))
      val vevent = cat(varintField(1, 12 /* ROW */), sub(5, rowEvent),
        strField(22, "ks"), strField(23, "s0"))
      sub(1, vevent) // VStreamResponse.events = 1
    }
    val packedDecoded = VtWire.decodeVStreamResponse(event(rowMsg(packed = true)))
    val unpackedDecoded = VtWire.decodeVStreamResponse(event(rowMsg(packed = false)))
    assert(packedDecoded == unpackedDecoded)
    val row = packedDecoded.head.asInstanceOf[RowEvent].changes.head.after.get
    assert(row.lengths == Seq(3L, -1L, 1L) && new String(row.values) == "abcx")
  }

  test("an embedded message split into two field chunks MERGES, never last-wins") {
    // one RowEvent serialized as two partial field-5 occurrences: the
    // table name + first change in chunk 1, the second change in chunk 2
    val row1 = cat(sub(1, { val b = new java.io.ByteArrayOutputStream(); writeVarint(b, zigzag(1L)); b.toByteArray }), sub(2, "a".getBytes))
    val row2 = cat(sub(1, { val b = new java.io.ByteArrayOutputStream(); writeVarint(b, zigzag(1L)); b.toByteArray }), sub(2, "b".getBytes))
    val chunk1 = cat(strField(1, "ks.t"), sub(2, sub(2, row1)))
    val chunk2 = sub(2, sub(2, row2))
    val vevent = cat(varintField(1, 12), sub(5, chunk1), sub(5, chunk2),
      strField(22, "ks"), strField(23, "s0"))
    val decoded = VtWire.decodeVStreamResponse(sub(1, vevent))
    val re = decoded.head.asInstanceOf[RowEvent]
    assert(re.table == "ks.t")
    assert(re.changes.map(_.after.get.values.head.toChar) == Seq('a', 'b'))
  }

  test("split RowChange.after and split ExecuteResponse.result both MERGE") {
    // one level deeper than the VEvent-field merge: the same partial-
    // serialization form applied to a RowChange and to a QueryResult
    def z(v: Long): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(); writeVarint(b, (v << 1) ^ (v >> 63)); b.toByteArray
    }
    // RowChange.after(2) split: lengths chunk + values chunk
    val rowA = sub(1, z(2L))
    val rowB = sub(2, "ab".getBytes)
    val rowChange = cat(sub(2, rowA), sub(2, rowB)) // two field-2 chunks
    val rowEvent = cat(strField(1, "ks.t"), sub(2, rowChange))
    val vevent = cat(varintField(1, 12), sub(5, rowEvent),
      strField(22, "ks"), strField(23, "s0"))
    val re = VtWire.decodeVStreamResponse(sub(1, vevent)).head.asInstanceOf[RowEvent]
    val after = re.changes.head.after.get
    assert(after.lengths == Seq(2L) && new String(after.values) == "ab")
    // ExecuteResponse.result(3) split: fields chunk + rows chunk
    val fld = cat(strField(1, "c0"), varintField(2, (9 | 256).toLong)) // INT64
    val row = cat(sub(1, z(1L)), sub(2, "7".getBytes))
    val resp = cat(sub(3, sub(1, fld)), sub(3, sub(4, row)))
    val decoded = VtWire.decodeExecuteResponse(resp)
    assert(decoded.error.isEmpty)
    val qr = decoded.result.get
    assert(qr.fields.map(_.name) == Seq("c0") && qr.rows.length == 1)
    assert(new String(qr.rows.head.values) == "7")
  }

  test("RPCError with code but EMPTY message still decodes as an error") {
    // proto3 omits the empty message string; field-1 PRESENCE must signal
    // failure or a real vtgate error reads as an empty success
    val resp = sub(1, varintField(3, 14 /* UNAVAILABLE */))
    val decoded = VtWire.decodeExecuteResponse(resp)
    assert(decoded.error.isDefined && decoded.error.get.contains("14"))
    assert(decoded.result.isEmpty)
  }

  test("PkField flags Some(0) survives the wire round-trip") {
    val v = Vgtid(Seq(ShardGtid("ks", "0", "MySQL56/x:1-5", Seq(TableLastPk(
      "t", Seq(PkField("id", "INT64", 63, Some(0))),
      Seq(PkRow(Seq("1"), java.util.Base64.getEncoder.encodeToString("7".getBytes))))))))
    val req = VtWire.VStreamRequestModel(2, v, Nil, VtWire.VStreamFlagsModel())
    val back = VtWire.decodeVStreamRequest(VtWire.encodeVStreamRequest(req))
    assert(back.vgtid == v) // Some(0) must not decay to None
  }

  test("an unknown vitess type id fails loudly instead of degrading to NULL_TYPE") {
    val field = cat(strField(1, "c0"), varintField(2, 31337L))
    val fieldEvent = cat(strField(1, "ks.t"), sub(2, field))
    val vevent = cat(varintField(1, 13 /* FIELD */), sub(6, fieldEvent),
      strField(22, "ks"), strField(23, "s0"))
    val err = intercept[IllegalStateException] {
      VtWire.decodeVStreamResponse(sub(1, vevent))
    }
    assert(err.getMessage.contains("unknown vitess type id 31337"))
  }

  test("a wire-type-mismatched field routes to unknown-field skip, never mis-slices the rest") {
    // field 5 (row_event) is DECLARED length-delimited; encode it as a
    // VARINT instead (the corrupted-tag / schema-drift shape). A decoder
    // that dispatched on field number alone would readByteArray() here —
    // consuming the varint VALUE (7) as a byte length and swallowing the
    // shard field that follows — producing a wrong-but-plausible event.
    // The protoc stance is: wire-type mismatch = unknown field = skip.
    val vevent = cat(
      varintField(1, 3 /* COMMIT */), varintField(2, 123456L),
      varintField(5, 7L), // row_event with the WRONG wire type
      strField(22, "ks"), strField(23, "-80"))
    val decoded = VtWire.decodeVStreamResponse(sub(1, vevent))
    assert(decoded == Seq(graft.streaming.CommitEvent("-80", "ks", 123456L)),
      s"mismatched-wire-type field must be skipped cleanly, got $decoded")
  }
}
