package graft.sinks

import graft.core.{ErrorPolicy, Reliability, RetryPolicy, Sink}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Sink connectors (SURVEY §2.2). Offset commit after a successful
  * micro-batch is the engine's ack (strictly stronger than the
  * reference's at-least-once — SURVEY §1.4→§1.5).
  */
object Sinks {
  private def applyTrigger[T](w: org.apache.spark.sql.streaming.DataStreamWriter[T],
      trigger: Option[Trigger], checkpoint: Option[String]) = {
    val t = trigger.fold(w)(w.trigger)
    checkpoint.fold(t)(c => t.option("checkpointLocation", c))
  }

  /** Console sink ≈ the reference's printer destination
    * (x/printer/printer.go:13-71) — demo/debug only, driver-side by
    * nature, exactly like an io.Writer. */
  final case class ConsoleSink(numRows: Int = 20) extends Sink {
    def writeBatch(df: DataFrame): Unit = df.show(numRows, truncate = false)
    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery =
      applyTrigger(df.writeStream.format("console"), trigger, checkpoint).start()
  }

  /** Durable columnar sink. */
  final case class ParquetSink(path: String) extends Sink {
    def writeBatch(df: DataFrame): Unit =
      df.write.mode("append").parquet(path)
    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery =
      applyTrigger(df.writeStream.format("parquet").option("path", path),
        trigger, checkpoint).start()
  }

  /** Named in-memory table sink (tests) — reference's memory destination
    * (x/memory/memory.go:34-60). */
  final case class MemorySink(queryName: String) extends Sink {
    def writeBatch(df: DataFrame): Unit =
      df.createOrReplaceTempView(queryName)
    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery =
      applyTrigger(df.writeStream.format("memory").queryName(queryName),
        trigger, checkpoint).start()
  }

  /** Gzip NDJSON, time-partitioned by the event timestamp — the
    * reference's S3 destination layout (`prefix/yyyy/MM/dd/HH/…gz`,
    * x/s3/s3.go:128-148) expressed as a partitioned columnar-dir write
    * (targetable at any hadoop-compatible FS, s3a:// included). Spark
    * writes one object per partition per micro-batch ≈ one gzip object
    * per flush. */
  final case class NdjsonGzipSink(path: String, tsCol: String) extends Sink {
    private def partitioned(df: DataFrame): DataFrame =
      df.withColumn("year", date_format(col(tsCol), "yyyy"))
        .withColumn("month", date_format(col(tsCol), "MM"))
        .withColumn("day", date_format(col(tsCol), "dd"))
        .withColumn("hour", date_format(col(tsCol), "HH"))
    def writeBatch(df: DataFrame): Unit =
      partitioned(df).write.mode("append")
        .partitionBy("year", "month", "day", "hour")
        .option("compression", "gzip").json(path)
    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery =
      applyTrigger(
        partitioned(df).writeStream.format("json")
          .partitionBy("year", "month", "day", "hour")
          .option("compression", "gzip").option("path", path),
        trigger, checkpoint).start()
  }

  /** Exact-fidelity flush layout of the reference's S3 destination: ONE
    * gzip NDJSON object per flush, keyed
    * `prefix/yyyy/MM/dd/HH/<ksuid>_<unixSeconds>.gz` from the FLUSH time
    * in UTC (x/s3/s3.go:143-148) — the key format a kawa user's
    * downstream consumers parse. Targets any Hadoop-compatible FS
    * (s3a:// included).
    *
    * Scale contract: this sink mirrors the reference's BATCHER semantics
    * — a flush is a bounded batch (default 100 msgs, x/batcher/
    * batcher.go:180-189). That bound is ENFORCED, not assumed (r14
    * verdict): the batch is drained through a local iterator in
    * `flushLength`-line chunks, one gzip object per chunk — exactly the
    * reference's one-object-per-flush layout — so a batch pipeline
    * pointed at this sink never collects the corpus onto the driver
    * (at most one partition is resident at a time). For bulk exports use
    * [[NdjsonGzipSink]] (partitioned, fully distributed); this one
    * exists for byte-level layout fidelity on flush-sized objects. */
  final case class S3ObjectLayoutSink(path: String,
      flushLength: Int = 100) extends Sink {
    def writeBatch(df: DataFrame): Unit = {
      require(flushLength > 0, s"flushLength must be > 0, got $flushLength")
      df.toJSON.toLocalIterator().asScala
        .grouped(flushLength)
        .foreach(chunk => writeObject(chunk.toArray))
    }
    private def writeObject(lines: Array[String]): Unit = {
      val now = java.time.Instant.now()
      val dir = java.time.format.DateTimeFormatter.ofPattern("yyyy/MM/dd/HH")
        .withZone(java.time.ZoneOffset.UTC).format(now)
      val p = new org.apache.hadoop.fs.Path(
        s"$path/$dir/${Ksuid.next(now)}_${now.getEpochSecond}.gz")
      val fs = p.getFileSystem(
        org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
      val out = new java.util.zip.GZIPOutputStream(fs.create(p, false))
      try lines.foreach { l =>
        out.write(l.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.write('\n')
      } finally out.close()
    }
    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery =
      applyTrigger(
        df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
          writeBatch(batch)
        }, trigger, checkpoint).start()
  }

  /** Minimal KSUID (github.com/segmentio/ksuid layout, public spec):
    * 4-byte big-endian seconds since the KSUID epoch (2014-05-13,
    * 1400000000) + 16 random bytes, base62-encoded to exactly 27 chars —
    * k-sortable by creation time, like the ids the reference's S3 keys
    * embed. */
  private[sinks] object Ksuid {
    private val Epoch = 1400000000L
    private val Alphabet =
      "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    private val rng = new java.security.SecureRandom()
    def next(now: java.time.Instant): String = {
      val raw = new Array[Byte](20)
      val ts = (now.getEpochSecond - Epoch).toInt
      raw(0) = (ts >>> 24).toByte; raw(1) = (ts >>> 16).toByte
      raw(2) = (ts >>> 8).toByte; raw(3) = ts.toByte
      val rand = new Array[Byte](16); rng.nextBytes(rand)
      System.arraycopy(rand, 0, raw, 4, 16)
      var n = new java.math.BigInteger(1, raw)
      val sixtyTwo = java.math.BigInteger.valueOf(62)
      val sb = new StringBuilder
      while (n.signum() > 0) {
        val Array(q, r) = n.divideAndRemainder(sixtyTwo)
        sb.append(Alphabet.charAt(r.intValue())); n = q
      }
      while (sb.length < 27) sb.append('0')
      sb.reverse.toString
    }
  }

  /** HTTP status outside 2xx from a webhook flush. 5xx and 429 are
    * retryable (transient server state); other 4xx are not (the request
    * itself is rejected — retrying re-sends the same bytes). */
  final class WebhookStatusException(val code: Int, body: String)
    extends RuntimeException(s"webhook returned HTTP $code: $body")

  /** Batcher-backed HTTP POST destination — the reference's RunReveal
    * webhook destination, whose whole config surface is one WebhookURL
    * (/root/reference/README.md:242-248). Each micro-batch flush
    * serializes to ONE NDJSON request body and POSTs it; non-2xx raises
    * and flows through the engine's batcher reliability contract —
    * [[graft.core.RetryPolicy]] backoff (defaults = the reference
    * batcher's 3 retries, 500 ms → 5 s ×2.0) and
    * [[graft.core.ErrorPolicy]] on exhaustion, exactly like every other
    * flush in `core/Reliability.scala`.
    *
    * Scale contract: like [[S3ObjectLayoutSink]], a flush is a
    * batcher-bounded batch (default 100 msgs) — ENFORCED (r14 verdict):
    * the batch drains through a local iterator in `flushLength`-line
    * chunks, one POST per chunk (the reference batcher's
    * one-request-per-flush shape), each chunk under its own
    * retry/error-policy dispatch. A batch pipeline pointed at a webhook
    * therefore never collects the corpus onto the driver, and never
    * POSTs it as one request — a webhook is a per-flush control-plane
    * endpoint, not a bulk-export path. */
  final case class WebhookSink(webhookUrl: String,
      retry: RetryPolicy = RetryPolicy(isRetryable = WebhookSink.retryable),
      onError: ErrorPolicy = ErrorPolicy.Raise,
      connectTimeoutMs: Int = 5000,
      readTimeoutMs: Int = 10000,
      flushLength: Int = 100) extends Sink {

    /** One POST attempt (no retries — [[writeBatch]] wraps it). */
    private[sinks] def postOnce(lines: Array[String]): Unit = {
      if (lines.isEmpty) return
      val body = (lines.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val conn = new java.net.URI(webhookUrl).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("POST")
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setDoOutput(true)
        conn.setFixedLengthStreamingMode(body.length)
        conn.setRequestProperty("Content-Type", "application/x-ndjson")
        val out = conn.getOutputStream
        try out.write(body) finally out.close()
        val code = conn.getResponseCode
        if (code < 200 || code >= 300) {
          val err = Option(conn.getErrorStream).map { s =>
            try new String(s.readNBytes(512),
              java.nio.charset.StandardCharsets.UTF_8)
            finally s.close()
          }.getOrElse("")
          throw new WebhookStatusException(code, err)
        }
        // drain + close the success stream so the connection is reusable
        val in = conn.getInputStream
        try { in.readAllBytes(); () } finally in.close()
      } finally conn.disconnect()
    }

    /** Drain the batch in flush-sized chunks, each POSTed under the one
      * batcher reliability implementation's retry + error-policy
      * dispatch; the real micro-batch id flows into the Discard log
      * line. An ErrorPolicy that swallows a failed chunk (Discard)
      * drops only that chunk, matching the reference batcher's
      * per-flush error surface. */
    private def flush(df: DataFrame, batchId: Long): Unit = {
      require(flushLength > 0, s"flushLength must be > 0, got $flushLength")
      df.toJSON.toLocalIterator().asScala
        .grouped(flushLength)
        .foreach { chunk =>
          val lines = chunk.toArray
          Reliability.retryingBatchWriter((_, _) => postOnce(lines),
            retry, onError)(df, batchId)
        }
    }
    def writeBatch(df: DataFrame): Unit = flush(df, 0L)
    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery =
      applyTrigger(
        df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
          flush(batch, batchId)
        }, trigger, checkpoint).start()
  }

  object WebhookSink {
    /** Connect/IO failures and transient HTTP states retry; a 4xx
      * (except 429) fails fast — the server rejected these bytes — and
      * so do deterministic configuration errors (a malformed URL can
      * never succeed; without this, every batch burns the full backoff
      * budget re-parsing the same bad config). */
    def retryable(t: Throwable): Boolean = t match {
      case w: WebhookStatusException => w.code >= 500 || w.code == 429
      case _: java.net.URISyntaxException | _: java.net.MalformedURLException |
           _: IllegalArgumentException => false
      case _ => true
    }
  }

  /** Fan-out tee — the reference's MultiDestination
    * (x/multi/multidest.go:9-49): each micro-batch is persisted once and
    * written to every child; offsets commit only after the last child
    * succeeds (the reference's coalesced last-ack). Same caveat as the
    * reference (types.go:109-113): the multi-write is not atomic across
    * sinks — a mid-batch failure can leave earlier sinks written
    * (redelivery makes it at-least-once; idempotent children make it
    * exactly-once). */
  final case class TeeSink(children: Seq[Sink]) extends Sink {
    def writeBatch(df: DataFrame): Unit = {
      df.persist()
      try children.foreach(_.writeBatch(df))
      finally df.unpersist()
    }
    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery =
      applyTrigger(
        df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
          writeBatch(batch)
        }, trigger, checkpoint).start()
  }

  /** Bucketed managed-table writer — the co-located-join layout for
    * repeated large⋈large joins on the same key (SURVEY §2.3 Joins row,
    * scale path): both sides pre-hashed into the same number of buckets,
    * sorted within buckets, so the join plans with zero Exchange (and a
    * sort-merge over pre-sorted buckets). At 100 TB this is the difference
    * between shuffling the fact table per query and never shuffling it. */
  object BucketedTable {
    def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
      df.write.format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .mode("overwrite").saveAsTable(table)
  }

  /** Publish sink — the reference's MQTT destination (S6,
    * /root/reference/x/mqtt/mqtt.go:96-198): publish each message's value
    * to a fixed topic, synchronously per message (mqtt.go:166-171
    * token.Wait()), acking the batch only after every publish succeeded —
    * here, offsets commit only after the ForeachWriter epoch completes.
    * The writer runs per partition on executors and resolves its client
    * at open() time ([[graft.sources.BrokerRegistry]]; a network MQTT
    * client would connect there instead — identical lifecycle). */
  final case class BrokerSink(broker: graft.sources.InProcBroker, topic: String)
      extends Sink {
    private val brokerId = graft.sources.BrokerRegistry.register(broker)

    private def writer = new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
      private val id = brokerId
      private val t = topic
      @transient private var b: graft.sources.InProcBroker = _
      def open(partitionId: Long, epochId: Long): Boolean = {
        b = graft.sources.BrokerRegistry.get(id); true
      }
      def process(row: org.apache.spark.sql.Row): Unit =
        b.publish(t, row.getAs[Array[Byte]]("value"))
      def close(errorOrNull: Throwable): Unit = ()
    }

    def writeBatch(df: DataFrame): Unit = {
      val id = brokerId
      val t = topic
      df.select(col("value")).foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          val b = graft.sources.BrokerRegistry.get(id)
          rows.foreach(r => b.publish(t, r.getAs[Array[Byte]]("value")))
      }
    }

    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery =
      applyTrigger(df.writeStream.foreach(writer), trigger, checkpoint).start()
  }

  /** Exactly-once adapter over an at-least-once child sink: micro-batches
    * whose batchId is already recorded in the commit manifest are skipped.
    *
    * Structured Streaming redelivers the in-flight batch after a
    * crash-before-offset-commit — the engine's version of the reference's
    * crash-before-ack window (types.go:76-96, SURVEY §1.4). For a child
    * sink without transactions, the manifest check turns that
    * at-least-once redelivery into exactly-once OUTPUT: redelivered
    * (queryId-scoped) batchIds are recognized and not re-written.
    *
    * Marker ordering is write-then-mark, so the residual failure window
    * is a crash BETWEEN child write and marker creation — exactly the
    * reference's send-succeeded-but-ack-lost window. Closing it entirely
    * requires the child write itself to be atomic (e.g. temp-file +
    * rename, or a transactional target). The manifest is one empty
    * marker file per batch via the Hadoop FS API, so it works on any
    * shared filesystem a real cluster would use.
    */
  final case class IdempotentSink(child: Sink, manifestDir: String)
      extends Sink {
    private def fs(spark: SparkSession) =
      new org.apache.hadoop.fs.Path(manifestDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)

    /** Markers are namespaced by the streaming query's id — batchIds are
      * only unique within one checkpoint lineage (they restart at 0 for a
      * fresh checkpoint), so an un-namespaced `batch-0.committed` left in
      * a reused manifestDir would silently swallow the first batches of a
      * NEW query: real data loss in the exactly-once component. The query
      * id is persisted in the checkpoint, so a restart from the same
      * checkpoint keeps its namespace (dedup still works), while a fresh
      * checkpoint gets a fresh one. Inside foreachBatch the id is
      * published by the engine as the `sql.streaming.queryId` local
      * property; batch-mode calls fall back to a shared namespace. */
    private def queryNs(df: DataFrame): String =
      Option(df.sparkSession.sparkContext
          .getLocalProperty("sql.streaming.queryId"))
        .getOrElse("batch")

    private def marker(ns: String, batchId: Long) =
      new org.apache.hadoop.fs.Path(manifestDir,
        s"$ns-batch-$batchId.committed")

    /** Write `df` unless `batchId` is already committed; mark it after. */
    def writeBatchIdempotent(df: DataFrame, batchId: Long): Unit = {
      val f = fs(df.sparkSession)
      val m = marker(queryNs(df), batchId)
      if (!f.exists(m)) {
        child.writeBatch(df)
        f.mkdirs(new org.apache.hadoop.fs.Path(manifestDir))
        f.create(m, true).close()
      }
    }

    def writeBatch(df: DataFrame): Unit = child.writeBatch(df)
    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery =
      applyTrigger(df.writeStream.foreachBatch(writeBatchIdempotent _),
        trigger, checkpoint).start()
  }

  /** foreachBatch sink with the reference's batcher retry/error-handler
    * semantics (x/batcher/batcher.go:460-540) — see
    * [[graft.core.Reliability]]. */
  final case class RetryingForeachSink(
      flush: (DataFrame, Long) => Unit,
      retry: RetryPolicy = RetryPolicy(),
      onError: ErrorPolicy = ErrorPolicy.Raise) extends Sink {
    private val wrapped = Reliability.retryingBatchWriter(flush, retry, onError)
    def writeBatch(df: DataFrame): Unit = wrapped(df, -1L)
    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery =
      applyTrigger(df.writeStream.foreachBatch(wrapped), trigger, checkpoint)
        .start()
  }
}
