package graft

import graft.core._
import graft.sinks.Sinks
import graft.sources.MemoryMessageSource
import graft.streaming.StreamingOps

import java.util.concurrent.atomic.AtomicInteger

/** Batcher retry/error-handler semantics
  * (/root/reference/x/batcher/batcher.go:460-540) mapped to micro-batch
  * commit: retry-until-success, non-retryable short-circuit, Discard
  * (≈ nil ErrorHandler ack-all), DontCommit (≈ ErrDontAck).
  */
class ReliabilitySpec extends SparkSpec {

  private def fastRetry(n: Int) =
    RetryPolicy(maxRetries = n, initialBackoffMs = 1, maxBackoffMs = 2)

  test("withRetries: succeeds after transient failures") {
    val attempts = new AtomicInteger
    val r = Reliability.withRetries(fastRetry(3)) {
      if (attempts.incrementAndGet() < 3) sys.error("transient")
      "ok"
    }
    assert(r == Right("ok") && attempts.get() == 3)
  }

  test("withRetries: non-retryable error short-circuits") {
    val attempts = new AtomicInteger
    val policy = fastRetry(5).copy(isRetryable = !_.getMessage.contains("fatal"))
    val r = Reliability.withRetries(policy) {
      attempts.incrementAndGet(); sys.error("fatal")
    }
    assert(r.isLeft && attempts.get() == 1)
  }

  test("withRetries: exhaustion returns the last error") {
    val attempts = new AtomicInteger
    val r = Reliability.withRetries(fastRetry(2)) {
      attempts.incrementAndGet(); sys.error("always")
    }
    assert(r.isLeft && attempts.get() == 3) // 1 try + 2 retries
  }

  test("withRetries: hanging attempt hits the per-attempt timeout, retries, then succeeds") {
    // FlushTimeout parity (batcher.go:465-472): attempt 1 hangs and is
    // cancelled at the deadline; attempt 2 completes fast.
    val attempts = new AtomicInteger
    val policy = fastRetry(2).copy(attemptTimeoutMs = Some(200))
    val r = Reliability.withRetries(policy) {
      if (attempts.incrementAndGet() == 1) Thread.sleep(60_000)
      "recovered"
    }
    assert(r == Right("recovered") && attempts.get() == 2)
  }

  test("withRetries: every attempt hangs -> exhaustion surfaces FlushTimeoutException to the error policy") {
    val attempts = new AtomicInteger
    val policy = fastRetry(1).copy(attemptTimeoutMs = Some(100))
    val r = Reliability.withRetries(policy) {
      attempts.incrementAndGet(); Thread.sleep(60_000); "never"
    }
    assert(attempts.get() == 2) // 1 try + 1 retry
    r match {
      case Left(t) => assert(t.isInstanceOf[FlushTimeoutException])
      case Right(_) => fail("expected timeout")
    }
    // and the error policy applies exactly as for any other failure:
    val dontCommit = Reliability.retryingBatchWriter(
      (_, _) => Thread.sleep(60_000),
      policy, ErrorPolicy.DontCommit)
    assertThrows[DontCommitException](dontCommit(Tables.nation(spark, sf), 0L))
  }

  test("withRetries: timeout exceptions respect isRetryable") {
    val attempts = new AtomicInteger
    val policy = fastRetry(5).copy(
      attemptTimeoutMs = Some(100),
      isRetryable = !_.isInstanceOf[FlushTimeoutException])
    val r = Reliability.withRetries(policy) {
      attempts.incrementAndGet(); Thread.sleep(60_000)
    }
    assert(r.isLeft && attempts.get() == 1) // non-retryable -> short-circuit
  }

  test("Discard policy swallows an exhausted batch; Raise and DontCommit throw") {
    val discard = Reliability.retryingBatchWriter(
      (_, _) => sys.error("boom"), fastRetry(1), ErrorPolicy.Discard)
    discard(Tables.nation(spark, sf), 0L) // must not throw

    val raise = Reliability.retryingBatchWriter(
      (_, _) => sys.error("boom"), fastRetry(1), ErrorPolicy.Raise)
    assertThrows[RuntimeException](raise(Tables.nation(spark, sf), 0L))

    val dontCommit = Reliability.retryingBatchWriter(
      (_, _) => sys.error("boom"), fastRetry(1), ErrorPolicy.DontCommit)
    assertThrows[DontCommitException](dontCommit(Tables.nation(spark, sf), 0L))
  }

  test("streaming: flaky flush retries within the batch, all data lands") {
    val src = new MemoryMessageSource(spark)
    src.add((1 to 10).map(i => Message.ofString(s"k$i", s"v$i", "t")))
    val flushed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val attempts = new AtomicInteger
    val sink = Sinks.RetryingForeachSink(
      (df, _) => {
        if (attempts.incrementAndGet() % 2 == 1) sys.error("flaky")
        df.collect().foreach(r =>
          flushed.add(new String(r.getAs[Array[Byte]]("value"), "UTF-8")))
      },
      fastRetry(3), ErrorPolicy.Raise)
    val q = Pipeline.from(src).start(spark, sink)
    StreamingOps.runToCompletion(q)
    val vals = flushed.toArray(Array.empty[String]).toSeq.sorted
    assert(vals == (1 to 10).map(i => s"v$i").sorted)
  }

  test("IdempotentSink: redelivered batchId writes once; new batchIds write") {
    val writes = new AtomicInteger
    val child = new graft.core.Sink {
      def writeBatch(df: org.apache.spark.sql.DataFrame): Unit = {
        df.count(); writes.incrementAndGet(); ()
      }
      def writeStream(df: org.apache.spark.sql.DataFrame,
          trigger: Option[org.apache.spark.sql.streaming.Trigger],
          checkpoint: Option[String]) =
        sys.error("unused")
    }
    val sink = Sinks.IdempotentSink(child, tmpDir("idem-manifest"))
    val df = Tables.nation(spark, sf)
    sink.writeBatchIdempotent(df, 7L)   // first delivery: writes
    sink.writeBatchIdempotent(df, 7L)   // crash-redelivery replay: skipped
    sink.writeBatchIdempotent(df, 8L)   // next batch: writes
    assert(writes.get() === 2,
      "batch 7 must write exactly once, batch 8 once")
  }

  test("IdempotentSink: streaming path dedups a replayed micro-batch end-to-end") {
    val src = new MemoryMessageSource(spark)
    src.add((1 to 5).map(i => Message.ofString(s"k$i", s"v$i", "t")))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val manifest = tmpDir("idem-stream")
    val child = new graft.core.Sink {
      def writeBatch(df: org.apache.spark.sql.DataFrame): Unit =
        df.collect().foreach(r =>
          seen.add(new String(r.getAs[Array[Byte]]("value"), "UTF-8")))
      def writeStream(df: org.apache.spark.sql.DataFrame,
          trigger: Option[org.apache.spark.sql.streaming.Trigger],
          checkpoint: Option[String]) =
        sys.error("unused")
    }
    val sink = Sinks.IdempotentSink(child, manifest)
    val q = Pipeline.from(src).start(spark, sink)
    StreamingOps.runToCompletion(q)
    // simulate the crash-before-offset-commit replay of batch 0: a real
    // redelivery runs under the SAME query id (it is persisted in the
    // checkpoint), so replay under that id; if the manifest check fails,
    // the sentinel row lands in `seen`
    import spark.implicits._
    val replay = Seq("vDUP".getBytes("UTF-8")).toDF("value")
    spark.sparkContext.setLocalProperty("sql.streaming.queryId",
      q.id.toString)
    try sink.writeBatchIdempotent(replay, 0L)
    finally spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
    val vals = seen.toArray(Array.empty[String]).toSeq.sorted
    assert(vals == (1 to 5).map(i => s"v$i").sorted,
      s"replayed batch must not duplicate output: $vals")
  }

  test("checkpoint restart: a NEW query on the same checkpoint resumes exactly-once") {
    // The reference's at-least-once contract
    // (/root/reference/types.go:49-58) under the failure it was designed
    // for: stop a LIVE streaming query mid-stream after ≥1 committed
    // batch, start a NEW query on the same checkpointLocation, drain,
    // and assert exactly-once output across the restart. The stopped
    // query's final batch is un-acked at the poller (the DSv2 commit
    // lags one trigger), so it is REDELIVERED; the restarted query runs
    // under the same persisted query id, so the IdempotentSink's marker
    // makes the redelivery invisible downstream.
    import graft.sources.{PolledSource, Poller}
    val total = 400
    // gate: phase 1 releases only 100 messages, so the first query is
    // GUARANTEED to stop mid-stream (not just hopefully-raced)
    val releasable = new AtomicInteger(100)
    val delivered = new AtomicInteger(0)
    val poller = new Poller {
      def poll(max: Int): Seq[Message] = {
        val start = delivered.get()
        val n = math.min(max, releasable.get() - start)
        if (n <= 0) Seq.empty
        else {
          delivered.addAndGet(n)
          (start until start + n).map(i => Message.ofString(s"k$i", s"v$i", "t"))
        }
      }
    }
    val src = PolledSource(poller, batchSize = 20)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val child = new graft.core.Sink {
      def writeBatch(df: org.apache.spark.sql.DataFrame): Unit =
        df.collect().foreach(r =>
          seen.add(new String(r.getAs[Array[Byte]]("value"), "UTF-8")))
      def writeStream(df: org.apache.spark.sql.DataFrame,
          trigger: Option[org.apache.spark.sql.streaming.Trigger],
          checkpoint: Option[String]) =
        sys.error("unused")
    }
    val sink = Sinks.IdempotentSink(child, tmpDir("restart-manifest"))
    val pipe = Pipeline.from(src).withCheckpoint(tmpDir("restart-ckpt"))
    val q1 = pipe.start(spark, sink)
    q1.processAllAvailable() // drains exactly the 100 released messages
    q1.stop(); q1.awaitTermination()
    val afterStop = seen.size()
    assert(afterStop == 100, s"first query must stop mid-stream at 100, saw $afterStop")
    // release the rest and restart: NEW StreamingQuery, same checkpoint
    releasable.set(total)
    val q2 = pipe.start(spark, sink)
    StreamingOps.runToCompletion(q2)
    assert(q2.id == q1.id && q2.runId != q1.runId,
      "a restart from the same checkpoint must keep the query id (new runId)")
    val vals = seen.toArray(Array.empty[String]).toSeq
    assert(vals.size == total,
      s"exactly-once across restart: expected $total writes, saw ${vals.size}")
    assert(vals.sorted == (0 until total).map(i => s"v$i").sorted,
      "restart must resume from the committed offset: all messages, no dups")
    src.close()
  }

  test("IdempotentSink: a NEW query's batch 0 is not swallowed by an old marker") {
    // batchIds restart at 0 for a fresh checkpoint; markers are
    // namespaced by query id, so query B's batch 0 must write even when
    // query A already committed ITS batch 0 into the same manifestDir.
    val writes = new AtomicInteger
    val child = new graft.core.Sink {
      def writeBatch(df: org.apache.spark.sql.DataFrame): Unit = {
        df.count(); writes.incrementAndGet(); ()
      }
      def writeStream(df: org.apache.spark.sql.DataFrame,
          trigger: Option[org.apache.spark.sql.streaming.Trigger],
          checkpoint: Option[String]) =
        sys.error("unused")
    }
    val sink = Sinks.IdempotentSink(child, tmpDir("idem-ns"))
    val df = Tables.nation(spark, sf)
    def as(qid: String)(body: => Unit): Unit = {
      spark.sparkContext.setLocalProperty("sql.streaming.queryId", qid)
      try body
      finally spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
    }
    as("query-A") { sink.writeBatchIdempotent(df, 0L) } // A/0: writes
    as("query-A") { sink.writeBatchIdempotent(df, 0L) } // A replay: skipped
    as("query-B") { sink.writeBatchIdempotent(df, 0L) } // B/0: MUST write
    assert(writes.get() === 2,
      "query B's batch 0 must not be deduped against query A's marker")
  }
}
