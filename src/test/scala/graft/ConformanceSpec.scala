package graft

import graft.core.{Message, Pipeline}
import graft.sinks.Sinks
import graft.sources.MemoryMessageSource
import graft.streaming.StreamingOps

import scala.util.Random

/** Port of the reference's black-box conformance suite
  * (/root/reference/test/suite_test.go:16-104): pump 25 random 20-byte
  * payloads through a source→pipeline→sink round trip and assert every
  * payload is observed with no duplicates.
  */
class ConformanceSpec extends SparkSpec {

  test("round-trip: all 25 payloads seen exactly once") {
    val rnd = new Random(42)
    val payloads = Seq.fill(25)(rnd.nextBytes(20))
    val src = new MemoryMessageSource(spark)
    src.add(payloads.map(b => Message("k", b, "t", Map("p" -> "conformance"))))

    val name = "conformance_out"
    val q = Pipeline.from(src).start(spark, Sinks.MemorySink(name))
    StreamingOps.runToCompletion(q)

    val seen = spark.table(name).collect()
      .map(r => r.getAs[Array[Byte]]("value").toSeq)
    assert(seen.length == 25, s"expected 25 messages, saw ${seen.length}")
    assert(seen.distinct.length == 25, "duplicate messages observed")
    assert(seen.toSet == payloads.map(_.toSeq).toSet, "payload set mismatch")
  }

  test("round-trip via poller source: all 25 payloads seen exactly once") {
    // the same suite property over the O10 pull→push adapter
    val rnd = new Random(43)
    val payloads = Seq.fill(25)(rnd.nextBytes(20))
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[Message]()
    payloads.zipWithIndex.foreach { case (b, i) =>
      queue.add(Message(s"k$i", b, "t", Map("p" -> "conformance")))
    }
    val poller = new graft.sources.Poller {
      def poll(max: Int): Seq[Message] = {
        val out = Vector.newBuilder[Message]
        var n = 0
        var m = queue.poll()
        while (m != null) { out += m; n += 1; m = if (n < max) queue.poll() else null }
        out.result()
      }
    }
    val src = graft.sources.PolledSource(poller, batchSize = 8)
    val q = Pipeline.from(src).start(spark, Sinks.MemorySink("conformance_poll_out"))
    StreamingOps.runToCompletion(q)

    val seen = spark.table("conformance_poll_out").collect()
      .map(r => r.getAs[Array[Byte]]("value").toSeq)
    assert(seen.length == 25, s"expected 25 messages, saw ${seen.length}")
    assert(seen.distinct.length == 25, "duplicate messages observed")
    assert(seen.toSet == payloads.map(_.toSeq).toSet, "payload set mismatch")
    src.close()
  }

  test("handler fan-out and filter-out (empty output = processed)") {
    val src = new MemoryMessageSource(spark)
    src.add(Seq(
      Message.ofString("a", "one two three", "t"),
      Message.ofString("b", "", "t"))) // filtered out by the handler below

    val name = "handler_out"
    val q = Pipeline.from(src)
      .via(graft.core.Transforms.splitValue(" "))
      .via(_.filter(org.apache.spark.sql.functions
        .length(org.apache.spark.sql.functions.col("value")) > 0))
      .start(spark, Sinks.MemorySink(name))
    StreamingOps.runToCompletion(q)

    val vals = spark.table(name).collect()
      .map(r => new String(r.getAs[Array[Byte]]("value"), "UTF-8")).sorted
    assert(vals.toSeq == Seq("one", "three", "two"))
  }
}
