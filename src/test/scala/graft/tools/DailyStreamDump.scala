package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic for the r11 optimization round: runs the
  * events_stream_daily gate's exact stream shape against a kept
  * checkpoint and dumps (a) the shuffle-partition count frozen into the
  * checkpoint offsets (= state store instances committed per
  * micro-batch) and (b) the number of micro-batches.
  * Usage: Test/runMain graft.tools.DailyStreamDump <outFile>
  */
object DailyStreamDump {
  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("/tmp/daily_stream.txt")
    val spark = graft.Tables.session("daily-dump", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("daily_feed")
    graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .repartition(8, col("event_id"))
      .write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val ckpt = java.nio.file.Files.createTempDirectory("daily_ckpt")
    // the gate body, minus the pin — run through SparkEntry's registered
    // query so the dump can never drift from what the bench times
    val t0 = System.nanoTime()
    graft.operators.LlmQueries.queries("events_stream_daily")(spark, sf)
      .write.format("noop").mode("overwrite").save()
    val gateSec = (System.nanoTime() - t0) / 1e9
    // now the stream shape itself, checkpoint kept, to read the frozen
    // conf — sized exactly like the gate sizes (or not) its session
    val ss = graft.streaming.StreamSizing.sessionFor(spark,
      graft.streaming.StreamSizing.statePartitions(
        keyCardinality = 155L,
        totalCores = spark.sparkContext.defaultParallelism))
    val q = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(dir.toString)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("noop")
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val offsets = new java.io.File(s"$ckpt/offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    val conf = offsets.headOption.map(f =>
      java.nio.file.Files.readString(f.toPath).split('\n')
        .find(_.contains("shuffle.partitions")).getOrElse("?")).getOrElse("?")
    val out = new java.io.PrintStream(new java.io.FileOutputStream(outFile))
    out.println("# events_stream_daily — stream shape evidence (sf0.001 feed, 8 files, maxFilesPerTrigger=2)")
    out.println(f"# registered gate wall time at sf0.001 (one cold run, noop sink): $gateSec%.2f s")
    out.println(s"# micro-batches: ${offsets.length}")
    out.println(s"# offsets[0] conf line (state partition count frozen at first start): $conf")
    out.close()
    println(s"DAILY_DUMP_DONE batches=${offsets.length} conf=$conf")
    spark.stop()
  }
}
