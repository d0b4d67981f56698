package graft.core

/** E1 retriable-error handling. The reference classifies EVERY gRPC
  * `StatusRuntimeException` as retriable and restarts streaming from the
  * last committed offset (VitessErrorHandler.java:23-30); the Spark
  * analogue is transient-I/O retry inside the reader plus Spark's own
  * task retry + restart-from-checkpoint for everything else. */
object Retry {

  /** Transient transport/storage errors → retriable; logic errors
    * (ordering violations, conversion failures in Fail mode) → not. */
  def isRetriable(t: Throwable): Boolean = t match {
    case _: java.io.FileNotFoundException => false // misconfiguration
    case _: java.io.IOException => true
    case _: java.util.concurrent.TimeoutException => true
    // gRPC status errors, under the stock or Spark-shaded package — the
    // reference classifies every StatusRuntimeException retriable
    case e: RuntimeException if e.getClass.getName.startsWith("io.grpc.") ||
      e.getClass.getName.startsWith("org.sparkproject.connect.grpc.") => true
    case _ => false
  }

  /** Run `f`, retrying retriable failures with exponential backoff. */
  def withRetries[T](maxAttempts: Int, initialBackoffMs: Long = 50L)(f: => T): T = {
    var attempt = 1
    var backoff = initialBackoffMs
    while (true) {
      try return f
      catch {
        case t: Throwable if isRetriable(t) && attempt < maxAttempts =>
          Thread.sleep(backoff)
          backoff = math.min(backoff * 2, 5000L)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
