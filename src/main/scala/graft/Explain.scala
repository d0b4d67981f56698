package graft

/** Plan inspector: prints the formatted physical plan of named
  * SparkEntry queries (all of them with no names given) — the review
  * loop for pushdown / broadcast / codegen checks at scale.
  *
  * Usage: runMain graft.Explain <sfDir> [name ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Tables.session("graft-explain", "4")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name =====")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: " +
        Option(e.getMessage).getOrElse(e.getClass.getName)) }
    }
    spark.stop()
  }
}
