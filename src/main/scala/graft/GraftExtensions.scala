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
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(extensions.injectFunction)
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

  private def cosineSim = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(
      classOf[graft.functions.CosineSim].getName,
      null,
      "cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float arrays in one fused codegen pass; 0.0 when either norm is 0.",
      ""),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_sim takes (a, b)")
      graft.functions.CosineSim(children(0), children(1)): Expression
    })

  private def all = Seq(slicePackedRow, cosineSim)

  /** Runtime registration into an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, id.funcName, info, builder)
    }
}
