package graft.tools

/** Shared spec helper for asserting on fail-loud paths: Spark wraps a
  * `raise_error` (or an executor-side require) in several layers of
  * SparkException, so asserting on `getMessage` alone misses the real
  * diagnostic. This walks the cause chain and returns every message —
  * the one helper the specs previously inlined 10+ times. */
object SpecErrors {
  /** Every non-null message down the cause chain, outermost first. */
  def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ messages(x.getCause))

  /** The chain's messages joined for `contains` assertions. */
  def messageText(t: Throwable): String = messages(t).mkString("\n")
}
