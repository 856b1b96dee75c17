package graft

import graft.core.{Message, Pipeline, Sink}
import graft.sources.MemoryMessageSource
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.util.concurrent.atomic.AtomicLong

/** Streaming-throughput twin of the reference's only benchmark,
  * `BenchmarkMem` (/root/reference/test/stream_test.go:29-41 via
  * BuildBench, suite_test.go:106-155): N messages — 25 distinct 20-byte
  * payloads cycled — pushed through memory source → identity pipeline →
  * counting memory sink, reporting msgs/sec end to end (source
  * ingestion, micro-batch planning, sink write, offset commit).
  *
  * Usage: `sbt "runMain graft.StreamBench [nMessages]"` (default 1M).
  * Prints one JSON line: {"metric":"stream_throughput","value":<msgs/s>,
  * "n":N,"seconds":S}.
  */
object StreamBench {
  private final class CountingSink extends Sink {
    val rows = new AtomicLong
    def writeBatch(df: DataFrame): Unit = { rows.addAndGet(df.count()); () }
    def writeStream(df: DataFrame, trigger: Option[Trigger],
        checkpoint: Option[String]): StreamingQuery = {
      val w = df.writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        writeBatch(b)
      }
      val t = trigger.fold(w)(w.trigger)
      checkpoint.fold(t)(c => t.option("checkpointLocation", c)).start()
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-streambench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the reference's payload shape: 25 distinct 20-byte values, cycled
    val payloads = Array.tabulate(25)(i =>
      (f"payload-$i%02d-".padTo(20, 'x')).getBytes("UTF-8"))
    val src = new MemoryMessageSource(spark)
    val chunk = 100000
    var added = 0
    while (added < n) {
      val sz = math.min(chunk, n - added)
      src.add((0 until sz).map { i =>
        val j = added + i
        Message(key = (j % 25).toString, value = payloads(j % 25),
          topic = "bench", attributes = Map.empty)
      })
      added += sz
    }
    val sink = new CountingSink
    val t0 = System.nanoTime()
    val q = Pipeline.from(src).availableNow.start(spark, sink)
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    require(sink.rows.get() == n, s"saw ${sink.rows.get()} of $n messages")
    println(f"""{"metric":"stream_throughput","value":${n / secs}%.0f,"unit":"msgs/sec","n":$n,"seconds":$secs%.3f}""")
    spark.stop()
  }
}
