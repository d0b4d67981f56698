package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust outlier detection for pipeline data cleaning: a value is an
  * outlier when its absolute deviation from the group median exceeds
  * `k` times the group's median absolute deviation (MAD). Median/MAD
  * resist the very outliers they hunt, unlike mean/stddev.
  *
  * Shape: two aggregations on the group key (median, then MAD of the
  * deviations) with joins back to the rows — the per-group stat tables
  * have one row per group, so AQE broadcasts them and the fact rows
  * shuffle at most once. `percentile` is the exact interpolating
  * quantile (same definition as DuckDB's `quantile_cont`), which
  * buffers a group's values in memory — right for bounded-cardinality
  * groups like event types; swap in `approx_percentile` for
  * high-cardinality grouping at scale. */
object Outliers {

  /** Degenerate-MAD contract: when the interpolated MEDIAN OF THE
    * ABSOLUTE DEVIATIONS is 0 — i.e. MORE than half a group's values
    * equal its median, or the two interpolation anchors are both zero
    * (exactly half equal is NOT enough: values 4,5,5,9 give deviations
    * 0,0,1,4 and mad = 0.5) — mad = 0 and EVERY nonzero deviation is
    * flagged at any `k`. That is the classic MAD definition with no
    * epsilon floor, mirrored verbatim by the oracle; callers cleaning
    * near-constant columns should pre-filter or floor the MAD
    * themselves, since silently injecting an epsilon here would diverge
    * from the published definition.
    *
    * Output: the input columns plus `adev` (the absolute deviation).
    * Internal names are __-prefixed; the input must not carry any
    * __-prefixed column NOR a column already named `adev` (the output
    * would silently clobber it) — every collision is rejected up front
    * with a named error, none overwrites silently. */
  def madOutliers(
      df: DataFrame, valueCol: String, groupCols: Seq[String],
      k: Double): DataFrame = {
    val reserved = df.columns.filter(c => c.startsWith("__") || c == "adev")
    require(reserved.isEmpty,
      s"madOutliers: input columns collide with internals/output: " +
        reserved.mkString(", "))
    val keys = groupCols.map(col)
    val med = df.groupBy(keys: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val dev = df.join(med, groupCols)
      .withColumn("__adev", abs(col(valueCol) - col("__med")))
    val mad = dev.groupBy(keys: _*)
      .agg(percentile(col("__adev"), lit(0.5)).as("__mad"))
    // fixed-point the boundary: both sides of the comparison are doubles
    // derived from each engine's own interpolated median, so a value
    // landing within one ulp of k·mad could classify differently between
    // engines; rounding both sides to 9 decimals makes the predicate
    // engine-independent (the same discipline as lmScore's fixed-point
    // sums), and 1e-9 is far below any meaningful deviation threshold.
    // A value within one ulp of a 9th-decimal .5 boundary could still
    // round apart, but over interpolated medians of integer data no
    // such value arises — accepted residual, not a correctness gap
    dev.join(mad, groupCols)
      .filter(round(col("__adev"), 9) > round(lit(k) * col("__mad"), 9))
      .withColumn("adev", col("__adev"))
      .drop("__med", "__adev", "__mad")
  }
}
