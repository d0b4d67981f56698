package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times each SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver. Results are fully materialized via
  * the `noop` DSv2 sink (executes the whole plan, writes nothing) so a
  * timing can't silently skip column evaluation the way `count()` can.
  * A failed query is reported in `"errors"` — never as a fake timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-reader paths before timing: without
    // this the alphabetically-first query absorbs all session startup
    // cost and the per-query numbers misreport steady-state throughput.
    try {
      spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
        .write.format("noop").mode("overwrite").save()
      spark.range(100000).selectExpr("sum(id) AS s")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = timings.map { case (k, v) => jstr(k) + ":" + f"$v%.3f" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = timings.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_failed":${errors.size},"sf":${jstr(sfDir)}}"""
    println(json)
    // The driver captures stdout with a bounded tail that can truncate the
    // early per-query timings; persist the full line (cwd-relative — the
    // repo root under sbt) so round-over-round comparison always covers
    // every query. A failed write must not fail the bench, but say so.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_full.json"), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] bench_full.json not written: $e") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
