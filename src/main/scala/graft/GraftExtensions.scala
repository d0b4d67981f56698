package graft

import graft.functions.SlicePackedRow
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so
  * `spark.sql("SELECT slice_packed_row(lengths, values)")` works in any
  * session built with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    val (id, info, builder) = GraftExtensions.slicePackedRow
    extensions.injectFunction((id, info, builder))
  }
}

object GraftExtensions {
  private def slicePackedRow = (
    FunctionIdentifier("slice_packed_row"),
    new ExpressionInfo(
      classOf[SlicePackedRow].getName,
      null,
      "slice_packed_row",
      "slice_packed_row(lengths, values) - splits packed VStream row bytes into per-column binary values; length -1 yields NULL.",
      ""),
    (children: Seq[Expression]) => {
      require(children.size == 2, "slice_packed_row takes (lengths, values)")
      SlicePackedRow(children(0), children(1)): Expression
    })

  /** Runtime registration into an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = slicePackedRow
    org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, id.funcName, info, builder)
  }
}
