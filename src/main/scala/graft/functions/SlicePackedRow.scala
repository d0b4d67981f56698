package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** D3 packed-row slicing as a native Catalyst expression with full
  * codegen: `slice_packed_row(lengths, values)` splits the concatenated
  * value bytes of a VStream ROW into per-column byte arrays; a length of
  * -1 yields a NULL element (reference:
  * VStreamOutputMessageDecoder.resolveColumns, :298-329).
  *
  * This is the whole-stage-codegen decode path: for schemas expressible
  * with built-in casts, the entire FIELD/ROW decode runs inside Tungsten
  * with no JVM object churn — the scale path for hot simple tables.
  */
case class SlicePackedRow(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = true)
  override def prettyName: String = "slice_packed_row"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        // without this, array<int> lengths pass analysis and getLong
        // reads 8 bytes across two 4-byte slots — silent garbage slices
        s"slice_packed_row expects (array<bigint>, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  /** Same fail-loud contract as the JVM decoder (PackedRow.slice): a
    * lengths sum past the value bytes is a truncated/hostile row and
    * must surface as an error — copyOfRange would silently zero-pad it
    * into NUL-embedded "data". Shared by both execution paths. */
  private def overrun(need: Long, have: Int): Nothing =
    throw new IllegalStateException(
      s"corrupt packed row: lengths sum past the value bytes (need $need, have $have)")

  override protected def nullSafeEval(lengthsAny: Any, valuesAny: Any): Any = {
    val lengths = lengthsAny.asInstanceOf[ArrayData]
    val values = valuesAny.asInstanceOf[Array[Byte]]
    val out = new Array[Any](lengths.numElements())
    var offset = 0
    var i = 0
    while (i < lengths.numElements()) {
      val len = lengths.getLong(i)
      if (len < 0) out(i) = null
      else {
        // long compare BEFORE the int cast: a hostile 2^32+5 length
        // must not truncate to 5 and mis-slice silently
        if (offset.toLong + len > values.length) overrun(offset.toLong + len, values.length)
        val l = len.toInt
        out(i) = java.util.Arrays.copyOfRange(values, offset, offset + l)
        offset += l
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lengths, values) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val self = ctx.addReferenceObj("slicePackedRow", this, classOf[SlicePackedRow].getName)
      s"""
         |final int $n = $lengths.numElements();
         |final Object[] $out = new Object[$n];
         |int $off = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $len = $lengths.getLong($i);
         |  if ($len < 0) {
         |    $out[$i] = null;
         |  } else {
         |    if (((long) $off) + $len > $values.length) {
         |      $self.graftOverrun(((long) $off) + $len, $values.length);
         |    }
         |    $out[$i] = java.util.Arrays.copyOfRange($values, $off, $off + (int) $len);
         |    $off += (int) $len;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  /** Codegen entry point for [[overrun]] (generated Java calls back into
    * the expression instance). */
  def graftOverrun(need: Long, have: Int): Unit = overrun(need, have)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SlicePackedRow =
    copy(left = newLeft, right = newRight)
}

object functions {
  import org.apache.spark.sql.GraftColumnBridge
  /** DataFrame-side entry point for the slicing expression. */
  def slice_packed_row(lengths: Column, values: Column): Column =
    GraftColumnBridge.column(SlicePackedRow(
      GraftColumnBridge.expression(lengths),
      GraftColumnBridge.expression(values)))
}
