package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, Option.empty[Set[String]])
      case Array(a, b, c) => (a, b, Some(c.split(",").toSet))
      case _ => sys.error(
        "usage: graft.Verify <sfDir> <outDir> [gate1,gate2,...]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // ONE shared builder (Tables.session) for every entry point: the
    // verified session and the benched session must not silently
    // diverge on a legacy flag or tz (their plans are compared)
    val spark = Tables.session("graft-verify", cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Gate surface is scalar-only: the driver's comparator sorts rows
        // by every column and cannot hash array/struct/map cells (r7's
        // emb_quantize red). Fail HERE, at build time, not in the driver.
        import org.apache.spark.sql.types.{ArrayType, MapType, StructType, NullType}
        val bad = df.schema.fields.filter(f => f.dataType match {
          case _: ArrayType | _: MapType | _: StructType | NullType => true
          case _                                                    => false
        })
        if (bad.nonEmpty)
          throw new IllegalStateException(
            s"gate '$name' emits non-scalar column(s) " +
              bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ") +
              " — stringify (concat_ws/to_json) on both sides")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        // A failed gate must not leave a PRIOR run's parquet behind in a
        // reused outDir: the comparator only fails on a MISSING dir, so
        // stale output would read as a green gate on a real regression.
        val staleDir = Paths.get(s"$outDir/$name")
        TempDirs.deleteRecursively(staleDir)
        if (Files.exists(staleDir))
          // removal is load-bearing here (stale parquet reads as a green
          // gate) — if it survives the delete, say so unmissably
          System.err.println(s"[verify] WARNING: could not remove stale " +
            s"output $staleDir — the comparator may report a STALE pass")
        failed += name
        // message-less throwables (NPE) must still name the failure class
        System.err.println(s"[verify] $name failed: " +
          Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonOut.str(k)}: ${JsonOut.str(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed.nonEmpty)
      // loud summary, but exit 0: per-gate red is the driver's signal —
      // a nonzero exit could let one flaky gate discard the other ~120
      // green results if the harness treats it as a whole-run failure
      System.err.println(s"[verify] ${failed.size} gate(s) FAILED (output " +
        s"removed so they read as red, never stale-green): ${failed.mkString(", ")}")
  }
}
