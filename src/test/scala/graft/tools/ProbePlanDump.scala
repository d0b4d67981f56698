package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic for the r11 optimization round: dumps the
  * formatted plan of one AnnIndex.probe frame and counts the driver
  * jobs one probe construction+execution schedules.
  * Usage: Test/runMain graft.tools.ProbePlanDump <outFile>
  */
object ProbePlanDump {
  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("/tmp/ann_probe_plan.txt")
    val spark = graft.Tables.session("plan-dump", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("plan_ann").resolve("idx").toString
    graft.operators.AnnIndex.build(
      emb.filter(col("vec_id") < 32 || col("vec_id") % 2 === 0), root, nCentroids = 32)
    graft.operators.AnnIndex.ingest(
      emb.filter(col("vec_id") >= 32 && col("vec_id") % 2 === 1), root, batchId = Some(1L))
    val sc = spark.sparkContext
    val counter = new java.util.concurrent.atomic.AtomicInteger
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    })
    val probe = graft.operators.AnnIndex.probe(
      emb.filter(col("vec_id") < 10), root, k = 5, nProbes = 4, rescoreFactor = 4)
    probe.write.format("noop").mode("overwrite").save()
    Thread.sleep(2000) // let the async listener bus drain
    val jobs = counter.get
    val out = new java.io.PrintStream(new java.io.FileOutputStream(outFile))
    out.println("# AnnIndex.probe(10 query ids, k=5, nProbes=4) over a built+ingested index")
    out.println(s"# driver jobs scheduled by ONE probe construction + noop execution: $jobs")
    Console.withOut(out) { probe.explain("formatted") }
    out.close()
    println(s"JOBS_FOR_ONE_PROBE=$jobs -> $outFile")
    spark.stop()
  }
}
