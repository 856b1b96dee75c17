package graft.core

import org.apache.spark.sql.DataFrame

/** Delivery/error semantics, mapping the reference's batcher contract
  * (/root/reference/x/batcher/batcher.go:460-540) onto Structured
  * Streaming's unit of atomicity, the micro-batch.
  *
  * The reference acks per message; Spark commits offsets per micro-batch.
  * So the three batcher error-handler outcomes become:
  *   - [[ErrorPolicy.Raise]]    — exhaust retries → rethrow → query dies
  *     (the reference's fatal-error contract, processor.go:94-118).
  *   - [[ErrorPolicy.Discard]]  — exhaust retries → log, drop the batch,
  *     commit offsets (the reference's nil ErrorHandler → ack-all,
  *     batcher.go:529-536).
  *   - [[ErrorPolicy.DontCommit]] — exhaust retries → fail the batch
  *     WITHOUT committing, and let the supervisor restart the query so the
  *     batch is redelivered (the reference's ErrDontAck, batcher.go:21,
  *     523-526 — coarsened from per-message to per-batch granularity; make
  *     sinks idempotent so the observable result is exactly-once).
  */
sealed trait ErrorPolicy
object ErrorPolicy {
  case object Raise extends ErrorPolicy
  case object Discard extends ErrorPolicy
  case object DontCommit extends ErrorPolicy
}

/** Retry with exponential backoff — defaults mirror the reference's
  * batcher (3 retries, 500 ms → 5 s, ×2.0; batcher.go:180-189).
  *
  * `attemptTimeoutMs` is the reference's per-attempt `FlushTimeout`
  * (batcher.go:465-472: a fresh context deadline wraps EVERY attempt, so a
  * hung flush is cancelled and retried instead of blocking the pipeline
  * forever). `None` disables it, like the reference's `flushTimeout == 0`.
  */
final case class RetryPolicy(
    maxRetries: Int = 3,
    initialBackoffMs: Long = 500,
    maxBackoffMs: Long = 5000,
    backoffMultiplier: Double = 2.0,
    isRetryable: Throwable => Boolean = _ => true,
    attemptTimeoutMs: Option[Long] = None)

/** A single flush attempt exceeded [[RetryPolicy.attemptTimeoutMs]] — the
  * engine's `context.DeadlineExceeded`. Retryable by default. */
final class FlushTimeoutException(timeoutMs: Long)
  extends RuntimeException(s"flush attempt exceeded ${timeoutMs} ms")

/** Batch failed under [[ErrorPolicy.DontCommit]]: offsets intentionally
  * not committed; a supervisor may restart the query for redelivery. */
final class DontCommitException(cause: Throwable)
  extends RuntimeException("flush failed; batch not committed", cause)

object Reliability {

  /** Run `op` under the retry policy; returns the last failure if
    * exhausted or non-retryable. With `attemptTimeoutMs` set, each attempt
    * runs under a deadline: on expiry the attempt thread is interrupted and
    * the attempt counts as a [[FlushTimeoutException]] failure (which flows
    * through `isRetryable` like any other error — batcher.go:465-472). */
  def withRetries[A](retry: RetryPolicy)(op: => A): Either[Throwable, A] = {
    var backoff = retry.initialBackoffMs
    var attempt = 0
    while (true) {
      // An interrupt on the calling thread (a streaming query being
      // stopped cancels its foreachBatch thread) must abort the whole
      // retry schedule immediately, with the interrupt status restored —
      // never be swallowed and retried through minutes of backoff. Fatal
      // VM errors propagate (NonFatal excludes them and interrupts).
      try return Right(runAttempt(retry.attemptTimeoutMs)(op))
      catch {
        case ie: InterruptedException =>
          Thread.currentThread().interrupt()
          return Left(ie)
        case scala.util.control.NonFatal(t) =>
          attempt += 1
          if (attempt > retry.maxRetries || !retry.isRetryable(t)) return Left(t)
          try Thread.sleep(backoff)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              return Left(ie)
          }
          backoff = math.min(
            (backoff * retry.backoffMultiplier).toLong, retry.maxBackoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One attempt, optionally under a deadline. The deadline path runs `op`
    * on a daemon thread and interrupts it on expiry — Spark jobs launched
    * inside `op` observe the interrupt via job cancellation when the caller
    * wires `spark.sparkContext.setJobGroup(..., interruptOnCancel=true)`;
    * a truly uninterruptible flush leaks its thread (daemon) but the
    * pipeline moves on, which is the reference's cancel-and-continue
    * behavior. */
  private def runAttempt[A](timeoutMs: Option[Long])(op: => A): A =
    timeoutMs match {
      case None => op
      case Some(ms) =>
        val task = new java.util.concurrent.FutureTask[A](() => op)
        val th = new Thread(task, "graft-flush-attempt")
        th.setDaemon(true)
        th.start()
        try task.get(ms, java.util.concurrent.TimeUnit.MILLISECONDS)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            task.cancel(true)
            throw new FlushTimeoutException(ms)
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
    }

  /** Wrap a foreachBatch flush with retry + error-policy semantics. */
  def retryingBatchWriter(
      flush: (DataFrame, Long) => Unit,
      retry: RetryPolicy = RetryPolicy(),
      onError: ErrorPolicy = ErrorPolicy.Raise): (DataFrame, Long) => Unit =
    (df, batchId) =>
      withRetries(retry)(flush(df, batchId)) match {
        case Right(_) => ()
        case Left(t) => onError match {
          case ErrorPolicy.Raise => throw t
          case ErrorPolicy.Discard =>
            System.err.println(
              s"[graft] discarding batch $batchId after retries: ${t.getMessage}")
          case ErrorPolicy.DontCommit => throw new DontCommitException(t)
        }
      }
}
