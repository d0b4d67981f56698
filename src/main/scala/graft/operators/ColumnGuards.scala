package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, raise_error, when}

/** The one fail-fast-on-null column guard. Operators that feed a null
  * into a non-nullable encoder or a keyed shuffle die mid-job with an
  * opaque executor error (or worse, compute silently with a null key);
  * the contract here is fail FAST and NAMED: the first null evaluates a
  * raise_error with an operator-specific message. One definition —
  * every hardened operator shares the semantics and message
  * convention. */
object ColumnGuards {

  def requireNonNull(c: Column, msg: Column): Column =
    when(c.isNull, raise_error(msg)).otherwise(c)

  def requireNonNull(c: Column, msg: String): Column =
    requireNonNull(c, lit(msg))

  /** Reject input columns that collide with an operator's internal
    * working names or output names — the repo convention (see
    * Outliers.madOutliers): a silent withColumn-overwrite-then-drop
    * loses the caller's column with no error, so every collision fails
    * identically up front instead. */
  def requireNoReserved(df: org.apache.spark.sql.DataFrame, op: String,
      reserved: Set[String]): Unit = {
    val hit = df.columns.filter(reserved)
    require(hit.isEmpty,
      s"$op: input columns collide with internals: ${hit.mkString(", ")}")
  }
}
