package graft.tools

/** Scratch diagnostic for the r11 optimization round: runs ONE registered
  * gate at the given SF dir and prints every Spark job it schedules with
  * wall duration and the first line of its call site — the per-job view
  * the (disabled) UI would give.
  * Usage: Test/runMain graft.tools.GateJobProfile <gate> [sfDir] [runs]
  */
object GateJobProfile {
  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse(sys.error("usage: GateJobProfile <gate> [sfDir] [runs]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 1
    val spark = graft.Tables.session("gate-profile", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .map(_.getProperty("callSite.short", "?")).getOrElse("?")
        jobs.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.remove(j.jobId)).foreach { case (t0, site) =>
          done.add((j.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      }
    })
    val fn = graft.SparkEntry.queries(gate)
    (1 to runs).foreach { r =>
      done.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // drain the listener bus
      import scala.jdk.CollectionConverters._
      val ds = done.asScala.toSeq.sortBy(_._1)
      println(f"== run $r: $gate wall=$wall%.2f s, jobs=${ds.size}, job-sum=${ds.map(_._2).sum}%.2f s")
      ds.foreach { case (id, sec, site) => println(f"  job $id%4d  $sec%7.3f s  $site") }
    }
    spark.stop()
  }
}
