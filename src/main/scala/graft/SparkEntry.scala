package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's gate query; each has
  * a DuckDB-equivalent oracle in `oracleSql` unless the op is not
  * SQL-expressible (driver then records a rows-only check).
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Analytics.queries, operators.Analytics.oracleSql),
      (operators.CdcQueries.queries, operators.CdcQueries.oracleSql),
      (operators.LlmQueries.queries, operators.LlmQueries.oracleSql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mergedDistinct(modules.map(_._1), "queries")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    mergedDistinct(modules.map(_._2), "oracleSql")

  /** `++` would let a duplicate gate name in a later module silently
    * SHADOW an earlier module's gate — the shadowed operator would never
    * be verified or benched again and every signal would stay green.
    * Refuse the collision loudly instead. */
  private def mergedDistinct[V](maps: Seq[Map[String, V]],
      what: String): Map[String, V] = {
    val merged = maps.reduce(_ ++ _)
    if (merged.size != maps.map(_.size).sum) {
      val dup = maps.flatMap(_.keys).groupBy(identity)
        .collect { case (k, vs) if vs.size > 1 => k }
      throw new IllegalStateException(
        s"SparkEntry.$what: gate name(s) registered in more than one " +
          s"module would shadow silently: ${dup.toSeq.sorted.mkString(", ")}")
    }
    merged
  }
}
