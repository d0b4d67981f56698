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
      s"""
         |final int $n = $lengths.numElements();
         |final Object[] $out = new Object[$n];
         |int $off = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $len = $lengths.getLong($i);
         |  if ($len < 0) {
         |    $out[$i] = null;
         |  } else {
         |    $out[$i] = java.util.Arrays.copyOfRange($values, $off, $off + (int) $len);
         |    $off += (int) $len;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

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
