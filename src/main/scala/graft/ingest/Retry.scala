package graft.ingest

/** X1 — bounded retry with exponential backoff, the policy the
  * reference applies at every external boundary (DKS 5×1s×2, HBase put
  * 5×10s×2, S3 5×1s×2, manifest 10× — SURVEY.md §2 X1). Spark task
  * retries recover coarse failures; this recovers transient service
  * errors inside a task without burning the whole partition's work.
  */
object Retry {

  final case class Policy(maxAttempts: Int, initialBackoffMs: Long, multiplier: Double) {
    def backoffFor(attempt: Int): Long =
      if (attempt <= 0) initialBackoffMs
      else (initialBackoffMs * attempt * multiplier).toLong
  }
  object Policy {
    /** DKS policy (HttpKeyService.kt:132-138) */
    val dks: Policy = Policy(5, 1000L, 2.0)
    /** HBase put policy (HBaseWriter.kt:57-64) */
    val put: Policy = Policy(5, 10000L, 2.0)
    /** manifest upload: 10 immediate attempts
      * (s3.manifest.retry.max.attempts default, HBaseWriter.kt:54-55;
      * StreamingManifestWriter.kt loops without backoff) */
    val manifest: Policy = Policy(10, 1L, 1.0)
    val immediate: Policy = Policy(5, 1L, 1.0)
  }

  /** Marker for errors that must NOT be retried (e.g. DKS HTTP 400 —
    * HttpKeyService.kt:62-66). */
  class FatalException(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)

  def withRetry[T](policy: Policy, what: String)(op: => T): T = {
    var attempts = 0
    var last: Throwable = null
    while (attempts < policy.maxAttempts) {
      try return op
      catch {
        case e: FatalException => throw e
        case e: Throwable =>
          last = e
          val delay = policy.backoffFor(attempts)
          attempts += 1
          if (attempts < policy.maxAttempts) Thread.sleep(delay)
      }
    }
    throw new RuntimeException(s"$what failed after ${policy.maxAttempts} attempts", last)
  }
}
