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
}
