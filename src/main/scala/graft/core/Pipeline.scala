package graft.core

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The pipeline façade — the engine's answer to the reference's
  * configure-and-run surface (`kawa.New(Config{Source, Destination,
  * Handler}).Run(ctx)`, /root/reference/processor.go:62-86, 131-167).
  *
  * A pipeline is declared as source → transforms → sink and compiles to a
  * plain DataFrame program, so Catalyst owns optimization and Structured
  * Streaming owns delivery. There is no hand-rolled worker pool
  * (processor.go:131-144): parallelism is partitions × cores. The
  * fatal-error contract (any Recv/Handle/Send error kills the processor,
  * processor.go:94-118) maps to exceptions in batch mode and query
  * termination surfaced by `awaitTermination` in streaming mode.
  *
  * Batching knobs mirror the reference's batcher operating point
  * (x/batcher/batcher.go:341-371): `FlushFrequency` →
  * `Trigger.ProcessingTime`, `FlushLength` → source rate options
  * (maxFilesPerTrigger / maxOffsetsPerTrigger), graceful finite-stream
  * drain (x/scanner/scanner.go:61-78) → `Trigger.AvailableNow`.
  */
final case class Pipeline(
    source: Source,
    transforms: Vector[DataFrame => DataFrame] = Vector.empty,
    trigger: Option[Trigger] = None,
    checkpoint: Option[String] = None,
    restartsOnDontCommit: Int = 0,
    watchdog: Option[graft.streaming.Monitoring.StallWatchdog] = None,
    metrics: Option[graft.streaming.Monitoring.MetricsListener] = None,
    tracer: Option[graft.streaming.Monitoring.SpanTracer] = None) {

  def via(t: DataFrame => DataFrame): Pipeline = copy(transforms = transforms :+ t)

  def triggerEvery(intervalMs: Long): Pipeline =
    copy(trigger = Some(Trigger.ProcessingTime(intervalMs)))

  /** Finite-stream drain: process everything available, then stop —
    * the reference's EOF-drain contract (scanner.go:61-78). */
  def availableNow: Pipeline = copy(trigger = Some(Trigger.AvailableNow()))

  def withCheckpoint(path: String): Pipeline = copy(checkpoint = Some(path))

  /** Stuck-batch watchdog — the reference's Tracing/Metrics processor
    * options (processor.go:37-57) + batcher deadlock watchdog
    * (x/batcher/batcher.go:296-339) as pipeline options. `onStall` fires
    * at most once per stall episode (see
    * [[graft.streaming.Monitoring.StallWatchdog]]); an idle stream —
    * triggers finding no data — never trips. */
  def withWatchdog(timeoutMs: Long)(
      onStall: graft.streaming.Monitoring.Stall => Unit): Pipeline =
    copy(watchdog =
      Some(new graft.streaming.Monitoring.StallWatchdog(timeoutMs, onStall)))

  /** Attach listener-bus metrics aggregation (rows, batches, state size,
    * batch durations) — zero cost on the data path. */
  def withMetrics(m: graft.streaming.Monitoring.MetricsListener): Pipeline =
    copy(metrics = Some(m))

  /** Attach per-hop span emission — the reference's Tracing option
    * (processor.go:13-17, 91-115) with the micro-batch as the hop; see
    * [[graft.streaming.Monitoring.SpanTracer]]. */
  def withTracing(t: graft.streaming.Monitoring.SpanTracer): Pipeline =
    copy(tracer = Some(t))

  /** Allow up to n query restarts on DontCommit batch failures
    * (ErrDontAck parity — redeliver instead of dying). */
  def withDontCommitRestarts(n: Int): Pipeline = copy(restartsOnDontCommit = n)

  private def applyTransforms(df: DataFrame): DataFrame =
    transforms.foldLeft(df)((d, t) => t(d))

  /** One-shot batch run (the degenerate finite pipeline). */
  def runBatch(spark: SparkSession, sink: Sink): Unit =
    sink.writeBatch(applyTransforms(source.batch(spark)))

  /** Start the streaming query (attaching any configured observers —
    * attach is idempotent across DontCommit restarts). */
  def start(spark: SparkSession, sink: Sink): StreamingQuery = {
    metrics.foreach(_.attach(spark))
    watchdog.foreach(_.attach(spark))
    tracer.foreach(_.attach(spark))
    sink.writeStream(applyTransforms(source.stream(spark)), trigger, checkpoint)
  }

  /** Start and block until completion, restarting on DontCommit failures
    * up to `restartsOnDontCommit` times (with the same checkpoint, so the
    * failed batch is redelivered). */
  def run(spark: SparkSession, sink: Sink): Unit = {
    var restarts = 0
    var again = true
    while (again) {
      again = false
      val q = start(spark, sink)
      try q.awaitTermination()
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException
            if causedByDontCommit(e) && restarts < restartsOnDontCommit =>
          restarts += 1
          again = true
        case e: Throwable => throw e
      }
    }
  }

  private def causedByDontCommit(t: Throwable): Boolean = {
    var c: Throwable = t
    while (c != null) {
      if (c.isInstanceOf[DontCommitException]) return true
      c = c.getCause
    }
    false
  }
}

object Pipeline {
  def from(source: Source): Pipeline = Pipeline(source)
}

/** A pluggable input (the reference's `Source[T]`, types.go:36-59). */
trait Source {
  def batch(spark: SparkSession): DataFrame
  def stream(spark: SparkSession): DataFrame
}

/** A pluggable output (the reference's `Destination[T]`, types.go:87-114).
  * `writeStream` returning a started query is the `Send`+`Run` pair;
  * offset commit after a successful batch is the ack (types.go:104-108).
  */
trait Sink {
  def writeBatch(df: DataFrame): Unit
  def writeStream(df: DataFrame, trigger: Option[Trigger],
      checkpoint: Option[String]): StreamingQuery
}
