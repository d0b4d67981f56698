package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, concat, lit, raise_error, when}

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

  /** In-plan guard that a sketch frame's recorded build-time `k` column
    * matches the `k` its consumer assumes — a mismatch silently
    * mis-scales an estimator or changes a sample's error bound, so it
    * raises with both values named. The check RIDES a column the plan
    * KEEPS (`rides`, default the frame's `h` column; quantile readers
    * ride the value column they aggregate) — a check on a column that
    * is later dropped would be pruned out of the plan along with its
    * raise_error. Shared by the KMV distinct sketch and the bottom-k
    * sample sketch — one definition so a fix to the k-mismatch class
    * reaches every sketch family. */
  def kChecked(k: Int, op: String, rides: Column = col("h")): Column =
    when(col("k") =!= k,
      raise_error(concat(lit(s"$op: sketch was built at k="),
        col("k").cast("string"), lit(s" but $op was asked for k=$k"))))
      .otherwise(rides)
}
