package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the checkpointed restart gates: runs one gate
  * twice and prints wall time per invocation with stage-level timing
  * emitted by the gate internals (via -Dgraft.profile=true if wired).
  * Not part of the suite; driven manually with Test/runMain. */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("cdc_reshard_epoch"))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"PROFILE $name run$i total=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
