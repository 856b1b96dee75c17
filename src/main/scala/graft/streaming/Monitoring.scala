package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import scala.jdk.CollectionConverters._

/** Observability for pipelines — the engine's mapping of the reference's
  * processor options and batcher watchdog onto Spark's listener bus.
  *
  *   - `Tracing`/`Metrics` options (/root/reference/processor.go:37-57)
  *     instrument every recv→handle→send hop; here the micro-batch is the
  *     hop, and [[MetricsListener]] aggregates the counters Spark already
  *     emits per progress event (rows in/out, batch durations) without
  *     touching the hot path.
  *   - The batcher's stuck-flush watchdog
  *     (/root/reference/x/batcher/batcher.go:296-339) distinguishes a mere
  *     idle period (no flushes in-flight → reset and continue) from a real
  *     deadlock (flushes in-flight that never complete → errDeadlock).
  *     [[StallWatchdog]] keeps that distinction: Spark fires
  *     `QueryIdleEvent` when a trigger found no data (idle → reset) and
  *     `QueryProgressEvent` when a batch completes (flush done → reset);
  *     a query that emits NEITHER for longer than the timeout is stuck
  *     inside a micro-batch — the deadlock case — and trips the callback.
  */
object Monitoring {

  /** Counters per query, accumulated from progress events (the analogue of
    * the reference's kawa delivery count/duration metrics). */
  final case class QueryStats(
      name: String,
      batches: Long,
      inputRows: Long,
      stateRows: Long,
      totalBatchMs: Long,
      lastProgressAtMs: Long,
      observed: Map[String, Map[String, String]] = Map.empty) {
    def avgBatchMs: Double = if (batches == 0) 0.0 else totalBatchMs.toDouble / batches
  }

  private final class MutableStats {
    val batches = new AtomicLong
    val inputRows = new AtomicLong
    val stateRows = new AtomicLong
    val totalBatchMs = new AtomicLong
    val lastProgressAt = new AtomicLong
    val name = new AtomicReference[String]("")
    val observed =
      new AtomicReference[Map[String, Map[String, String]]](Map.empty)
  }

  /** Listener-bus metrics aggregation — zero cost on the data path. */
  final class MetricsListener extends StreamingQueryListener {
    private val stats = new ConcurrentHashMap[UUID, MutableStats]()
    private val attached = new java.util.concurrent.atomic.AtomicBoolean(false)

    /** Idempotent: restart loops (Pipeline.run) may re-enter start(). */
    def attach(spark: SparkSession): this.type = {
      if (attached.compareAndSet(false, true)) spark.streams.addListener(this)
      this
    }

    def detach(spark: SparkSession): Unit =
      if (attached.compareAndSet(true, false)) spark.streams.removeListener(this)

    private def entry(id: UUID): MutableStats =
      stats.computeIfAbsent(id, _ => new MutableStats)

    override def onQueryStarted(e: QueryStartedEvent): Unit =
      entry(e.id).name.set(Option(e.name).getOrElse(""))

    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val s = entry(e.progress.id)
      s.batches.incrementAndGet()
      s.inputRows.addAndGet(e.progress.numInputRows)
      // numRowsTotal is a gauge (current state-store size), not a per-batch
      // delta — record the last observed value, never a running sum.
      s.stateRows.set(
        Option(e.progress.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L))
      Option(e.progress.durationMs.get("triggerExecution"))
        .foreach(d => s.totalBatchMs.addAndGet(d.longValue()))
      // user-defined Dataset.observe metrics: latest value per observation
      // name, each row flattened to column → rendered value (gauges, so
      // last-wins like stateRows)
      val obs = e.progress.observedMetrics
      if (obs != null && !obs.isEmpty) {
        val flat = obs.asScala.map { case (name, row) =>
          name -> row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
            f -> String.valueOf(row.get(i))
          }.toMap
        }.toMap
        s.observed.updateAndGet(prev => prev ++ flat)
      }
      s.lastProgressAt.set(System.currentTimeMillis())
    }

    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

    def snapshot: Map[UUID, QueryStats] =
      stats.asScala.map { case (id, s) =>
        id -> QueryStats(s.name.get(), s.batches.get(), s.inputRows.get(),
          s.stateRows.get(), s.totalBatchMs.get(), s.lastProgressAt.get(),
          s.observed.get())
      }.toMap
  }

  /** One emitted span — the engine's analogue of the reference's OTel
    * span (processor.go:13-17, 91-115). `traceId` is the query run,
    * `parentId` links children to their batch's root span. */
  final case class Span(
      traceId: String, spanId: String, parentId: Option[String],
      name: String, batchId: Long, durationMs: Long,
      attrs: Map[String, String] = Map.empty)

  /** Minimal per-hop tracer — the reference wraps every
    * recv→handle→send iteration in OTel spans (`kawa.processor.full` ⊃
    * `src.recv`, `handler.handle`, `dst.send`; processor.go:91-115).
    * Here the micro-batch IS the hop, and Spark already times its phases:
    * `durationMs` on every progress event carries latestOffset/getBatch
    * (the recv), addBatch (the handle+send — Spark fuses them in one
    * plan execution), and walCommit/commitOffsets (the ack). This
    * listener re-emits that decomposition as a span tree per batch —
    * zero instrumentation on the data path, exactly like the metrics
    * listener. `export` receives each completed span (stdout JSON, OTLP
    * adapter, …); spans are also ring-buffered for inspection. */
  final class SpanTracer(export: Span => Unit = _ => (),
      keep: Int = 1024) extends StreamingQueryListener {
    private val buf = new java.util.concurrent.ConcurrentLinkedDeque[Span]()
    private val attached = new java.util.concurrent.atomic.AtomicBoolean(false)

    private def emit(s: Span): Unit = {
      buf.addLast(s)
      while (buf.size() > keep) buf.pollFirst()
      export(s)
    }

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val trace = p.runId.toString
      val root = s"$trace-${p.batchId}"
      def dur(keys: String*): Long = keys.flatMap { k =>
        Option(p.durationMs.get(k)).map(_.longValue())
      }.sum
      def child(name: String, keys: String*): Unit = {
        val d = dur(keys: _*)
        if (d >= 0 && keys.exists(k => p.durationMs.containsKey(k)))
          emit(Span(trace, s"$root/$name", Some(root), name, p.batchId, d))
      }
      child("graft.processor.src.recv", "latestOffset", "getBatch")
      child("graft.processor.handle.send", "addBatch")
      child("graft.processor.ack", "walCommit", "commitOffsets")
      emit(Span(trace, root, None, "graft.processor.full", p.batchId,
        dur("triggerExecution"),
        Map("query" -> Option(p.name).getOrElse(""),
          "numInputRows" -> p.numInputRows.toString)))
    }

    def spans: Seq[Span] = buf.toArray(Array.empty[Span]).toSeq

    /** Idempotent: restart loops (Pipeline.run) may re-enter start(). */
    def attach(spark: SparkSession): this.type = {
      if (attached.compareAndSet(false, true)) spark.streams.addListener(this)
      this
    }
    def detach(spark: SparkSession): Unit =
      if (attached.compareAndSet(true, false)) spark.streams.removeListener(this)
  }

  /** A stall detected by [[StallWatchdog]]: `sinceMs` is how long the query
    * has been inside a micro-batch with no progress and no idle tick. */
  final case class Stall(id: UUID, runId: UUID, name: String, sinceMs: Long)

  /** Stuck-flush watchdog (batcher.go:296-339 semantics). Register with
    * [[StallWatchdog.attach]]; `onStall` fires at most once per stall
    * episode per query (re-arming after the next progress event), mirroring
    * the reference's single errDeadlock signal without killing the query —
    * the callback decides (log, page, or `query.stop()`).
    */
  final class StallWatchdog(timeoutMs: Long, onStall: Stall => Unit)
      extends StreamingQueryListener {

    private final class State(val name: String) {
      val lastAlive = new AtomicLong(System.currentTimeMillis())
      @volatile var runId: UUID = _
      @volatile var tripped = false
    }
    private val states = new ConcurrentHashMap[UUID, State]()
    private var checker: ScheduledExecutorService = _
    private val attached = new java.util.concurrent.atomic.AtomicBoolean(false)

    /** Trip count across all stall episodes (observability/testing). */
    private[graft] val totalTrips = new AtomicLong(0L)

    override def onQueryStarted(e: QueryStartedEvent): Unit = {
      val s = new State(Option(e.name).getOrElse(""))
      s.runId = e.runId
      states.put(e.id, s)
    }

    /** A finished batch = a completed flush → reset (wdResetC analogue). */
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      Option(states.get(e.progress.id)).foreach { s =>
        s.lastAlive.set(System.currentTimeMillis())
        s.tripped = false
      }

    /** No data this trigger = no flush in-flight → idle, not deadlock:
      * reset and continue (batcher.go:316-328). */
    override def onQueryIdle(e: QueryIdleEvent): Unit =
      Option(states.get(e.id)).foreach(_.lastAlive.set(System.currentTimeMillis()))

    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      states.remove(e.id)

    private def check(): Unit = {
      val now = System.currentTimeMillis()
      states.forEach { (id, s) =>
        val since = now - s.lastAlive.get()
        if (since > timeoutMs && !s.tripped) {
          s.tripped = true
          totalTrips.incrementAndGet()
          onStall(Stall(id, s.runId, s.name, since))
        }
      }
    }

    /** Idempotent: restart loops (Pipeline.run) may re-enter start(). */
    def attach(spark: SparkSession): this.type = {
      if (attached.compareAndSet(false, true)) {
        spark.streams.addListener(this)
        checker = Executors.newSingleThreadScheduledExecutor { r =>
          val t = new Thread(r, "graft-stall-watchdog"); t.setDaemon(true); t
        }
        val period = math.max(timeoutMs / 4, 10L)
        checker.scheduleAtFixedRate(() => check(), period, period, TimeUnit.MILLISECONDS)
      }
      this
    }

    def detach(spark: SparkSession): Unit =
      if (attached.compareAndSet(true, false)) {
        spark.streams.removeListener(this)
        if (checker != null) checker.shutdownNow()
      }
  }
}
