package graft

import graft.core.{Message, Pipeline, Transforms}
import graft.sinks.Sinks
import graft.sources.InProcBroker
import graft.streaming.Monitoring

import java.util.concurrent.ConcurrentLinkedQueue

/** The whole round-trip story in one test: a pull-style API enters
  * through the DSv2 poller adapter (O10), flows through Pipeline
  * transforms with metrics + watchdog attached (the processor options),
  * and is republished through the broker sink (S6) to a downstream
  * subscriber (S5) — every piece of the reference's
  * source → handler → destination triple on Spark machinery, with the
  * conformance suite's all-seen-once property checked at the far end.
  */
class IntegrationSpec extends SparkSpec {

  test("poller → transforms (metrics+watchdog) → broker sink → subscriber round trip") {
    val queue = new ConcurrentLinkedQueue[Message]()
    (0 until 20).foreach(i =>
      queue.add(Message.ofString(s"k$i", s"payload-$i word", "in",
        Map("origin" -> "poller"))))
    val poller = new graft.sources.Poller {
      def poll(max: Int): Seq[Message] = {
        val out = Vector.newBuilder[Message]
        var n = 0
        var m = queue.poll()
        while (m != null) { out += m; n += 1; m = if (n < max) queue.poll() else null }
        out.result()
      }
    }
    val broker = new InProcBroker
    val downstream = broker.subscribe("out/#")

    val metrics = new Monitoring.MetricsListener
    val src = graft.sources.PolledSource(poller, batchSize = 7)
    val p = Pipeline.from(src)
      .via(df => df.withColumn("attributes", Transforms.layerAttributes(
        org.apache.spark.sql.functions.col("attributes"),
        org.apache.spark.sql.functions.map(
          org.apache.spark.sql.functions.lit("stage"),
          org.apache.spark.sql.functions.lit("enriched")))))
      .withMetrics(metrics)
      .withWatchdog(timeoutMs = 60000)(_ => ()) // generous: must NOT trip here
    val q = p.start(spark, Sinks.BrokerSink(broker, "out/enriched"))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()

    // all-seen-once at the far end of the chain (suite property)
    val got = downstream.poll(100)
    assert(got.length == 20, s"expected 20 delivered, got ${got.length}")
    val vals = got.map(Message.valueString)
    assert(vals.distinct.length == 20, "duplicates observed downstream")
    assert(vals.toSet == (0 until 20).map(i => s"payload-$i word").toSet)
    assert(got.forall(_.topic == "out/enriched"))

    // observability saw the pipeline; the healthy run never tripped
    val deadline = System.currentTimeMillis() + 10000
    var ok = false
    while (!ok && System.currentTimeMillis() < deadline) {
      ok = metrics.snapshot.values.exists(s => s.inputRows >= 20 && s.batches >= 1)
      if (!ok) Thread.sleep(100)
    }
    assert(ok, s"metrics listener missed the pipeline: ${metrics.snapshot}")
    assert(p.watchdog.get.totalTrips.get() == 0, "healthy pipeline must not trip the watchdog")

    p.watchdog.foreach(_.detach(spark))
    metrics.detach(spark)
    src.close()
  }

  test("LLM ingest: scanner → deserialize → near-dedup → decontaminate → gzip sink (AvailableNow)") {
    // The full kawa-shaped training-data ingest in one pipeline: raw
    // NDJSON enters through the Scanner source (S2), is deserialized
    // (O6), near-deduplicated within the watermark (winnow-key), scrubbed
    // against a benchmark corpus (per-row broadcast filter — the
    // streaming-safe decontamination), and lands as time-partitioned
    // gzip NDJSON (S4) — every stage distributed, no driver loops.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._

    val inDir = tmpDir("ingest_in")
    val docs = Seq(
      // near-dup pair: identical text, different ids — exactly one survives
      """{"doc_id":1,"ts":"2026-08-12T10:01:00","text":"alpha beta gamma delta epsilon zeta eta theta"}""",
      """{"doc_id":2,"ts":"2026-08-12T10:02:00","text":"alpha beta gamma delta epsilon zeta eta theta"}""",
      // clean unique doc — survives
      """{"doc_id":3,"ts":"2026-08-12T10:03:00","text":"one two three four five six seven eight"}""",
      // contaminated: shares the trigram "secret eval answer" with bench
      """{"doc_id":4,"ts":"2026-08-12T10:04:00","text":"the secret eval answer is hidden in this doc"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(inDir, "batch.ndjson"),
      docs.mkString("\n").getBytes("UTF-8"))

    val bench = {
      import spark.implicits._
      Seq("our secret eval answer key must never train").toDF("text")
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))

    val outDir = tmpDir("ingest_out")
    val p = Pipeline.from(graft.sources.ScannerSource(inDir))
      .via(Transforms.deserializeJson(schema))
      .via(graft.streaming.StreamingOps.nearDedupByWinnow(
        "text", "doc_id", "ts", watermark = "10 minutes"))
      .via(df => graft.ops.Curation.decontaminateStream(
        df.select("doc_id", "ts", "text"), "text", bench, "text"))
      .availableNow
      .withCheckpoint(tmpDir("ingest_ckpt"))
    val q = p.start(spark, Sinks.NdjsonGzipSink(outDir, "ts"))
    q.awaitTermination()

    val back = spark.read
      .json(s"$outDir/year=*/month=*/day=*/hour=*/*.json.gz")
    val ids = back.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(Set(1L, 2L)).size == 1,
      s"exactly one of the near-dup pair must survive: $ids")
    assert(ids.contains(3L), s"clean doc must survive: $ids")
    assert(!ids.contains(4L), s"contaminated doc must be dropped: $ids")
    // layout: landed under the event-time hour partition
    val gz = java.nio.file.Files.walk(java.nio.file.Paths.get(outDir))
      .toArray.map(_.toString).filter(_.endsWith(".json.gz"))
    assert(gz.nonEmpty && gz.forall(_.contains("year=2026/month=08/day=12/hour=10")),
      s"unexpected layout: ${gz.toSeq}")
  }
}
