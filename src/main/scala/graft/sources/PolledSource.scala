package graft.sources

import graft.core.{Message, Source}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** The pull→push adapter (O10) — the reference's poller
  * (/root/reference/x/poller/poller.go:15-99) re-expressed as a DataSource
  * V2 `MicroBatchStream`, Spark's native micro-batch source contract.
  *
  * The reference wraps a batch `Poll(ctx, max) ([]Message, ack, err)` API
  * and coalesces the ack to the last message of each polled batch
  * (poller.go:83-99). Here the mapping is exact:
  *
  *   - `Poll(max)`       → [[Poller.poll]] invoked from `latestOffset()`
  *                         once per trigger (the micro-batch admission
  *                         point), up to `batchSize` messages — the
  *                         reference's `WithBatchSize` knob.
  *   - ack-on-durable    → [[MicroBatchStream.commit]]: Spark commits the
  *                         end offset only after the batch's outputs are
  *                         durably written, and we forward ONE
  *                         [[Poller.ack]] for the whole committed range —
  *                         the coalesced last-ack, at micro-batch
  *                         granularity (SURVEY §7.4.1).
  *
  * Spark calls `commit(end)` for batch N while constructing batch N+1
  * (MicroBatchExecution.cleanUpLastExecutedMicroBatch), so the ack for a
  * batch lags until the next batch exists; a query stopped right after
  * its final batch leaves that batch un-acked and the poller redelivers
  * it next run — exactly the reference's at-least-once shutdown contract
  * (unacked messages are redelivered, SURVEY §1.4).
  *
  * Polled messages are buffered on the driver keyed by offset until
  * committed, so an uncommitted batch is replayable within the run (task
  * retries, speculative re-reads). Like the reference's poller, the
  * wrapped API itself is non-replayable across process restarts: delivery
  * is at-least-once, and the poller's own ack tracking is the durable
  * cursor. This is the standard Spark shape for callback/queue APIs
  * (socket and rate sources buffer the same way); data reaches executors
  * inside the serialized [[InputPartition]]s.
  */
trait Poller extends Serializable {
  /** Pull up to `max` messages; empty means nothing available right now. */
  def poll(max: Int): Seq[Message]

  /** Durability callback: `n` messages (one contiguous committed range)
    * are fully written downstream. Called once per committed micro-batch —
    * the coalesced last-ack (poller.go:83-99). */
  def ack(n: Long): Unit = ()
}

/** Driver-side registry connecting the user's in-process [[Poller]] object
  * to the DSv2 stream (which Spark instantiates reflectively from the
  * format class name, so it can't hold the object directly). */
object PollerRegistry {
  final class Handle(val poller: Poller) {
    // offset semantics: message i (0-based) lives at offset i+1; an offset
    // N means "N messages observed". committedUpTo ≤ buffered range start.
    private val buf = new ArrayBuffer[Message]()
    private var base: Long = 0L // offset of buf(0)
    private var latest: Long = 0L
    private var committed: Long = 0L

    def fetch(max: Int): Long = synchronized {
      val got = poller.poll(max)
      buf ++= got
      latest += got.size
      latest
    }

    def slice(start: Long, end: Long): Seq[Message] = synchronized {
      require(start >= base,
        s"offset range [$start,$end) below committed horizon $base — " +
          "polled sources are not replayable across commits")
      buf.slice((start - base).toInt, (end - base).toInt).toVector
    }

    def commit(end: Long): Unit = synchronized {
      if (end > committed) {
        poller.ack(end - committed)
        buf.dropInPlace((end - base).toInt)
        base = end
        committed = end
      }
    }

    def latestOffset: Long = synchronized(latest)
  }

  private val handles = new ConcurrentHashMap[String, Handle]()

  def register(p: Poller): String = {
    val id = UUID.randomUUID().toString
    handles.put(id, new Handle(p))
    id
  }

  def get(id: String): Handle = {
    val h = handles.get(id)
    require(h != null, s"no poller registered under id $id")
    h
  }

  def unregister(id: String): Unit = handles.remove(id)
}

/** Engine-facing source: wrap a [[Poller]] and stream it. Batch mode
  * drains the poller to exhaustion (the degenerate finite pipeline). */
final case class PolledSource(poller: Poller, batchSize: Int = 100) extends Source {
  val pollerId: String = PollerRegistry.register(poller)

  def stream(spark: SparkSession): DataFrame =
    spark.readStream
      .format(classOf[PolledSourceProvider].getName)
      .option("pollerId", pollerId)
      .option("batchSize", batchSize)
      .load()

  def batch(spark: SparkSession): DataFrame = {
    val all = Iterator.continually(poller.poll(batchSize))
      .takeWhile(_.nonEmpty).flatten.toSeq
    poller.ack(all.size.toLong)
    spark.createDataFrame(
      spark.sparkContext.parallelize(all.map(m =>
        org.apache.spark.sql.Row(m.key, m.value, m.topic, m.attributes))),
      Message.schema)
  }

  def close(): Unit = PollerRegistry.unregister(pollerId)
}

/** DSv2 plumbing: provider → table → scan → [[PolledMicroBatchStream]]. */
class PolledSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Message.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = new PolledTable
}

private[sources] class PolledTable extends Table with SupportsRead {
  override def name(): String = "graft-polled"
  override def schema(): StructType = Message.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = Message.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PolledMicroBatchStream(
            options.get("pollerId"),
            options.getInt("batchSize", 100))
      }
    }
}

/** A monotone count-of-messages-observed offset. */
final case class PollOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class PolledMicroBatchStream(pollerId: String, batchSize: Int)
    extends MicroBatchStream {
  private def handle = PollerRegistry.get(pollerId)

  override def initialOffset(): Offset = PollOffset(0L)

  /** Admission point: one poll per trigger, capped at batchSize (the
    * reference's WithBatchSize rate limit). */
  override def latestOffset(): Offset = PollOffset(handle.fetch(batchSize))

  override def deserializeOffset(json: String): Offset = PollOffset(json.toLong)

  /** The committed [start,end) range is split into up to
    * `defaultParallelism` InputPartitions so a high-rate poller's batch
    * fans out across executor cores instead of bottlenecking one task
    * (the poll itself is serial per the reference contract — poller.go —
    * but the downstream transform work need not be). */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PollOffset].n
    val e = end.asInstanceOf[PollOffset].n
    if (e <= s) Array.empty
    else {
      val rows = handle.slice(s, e)
      val k = math.min(
        org.apache.spark.SparkContext.getOrCreate().defaultParallelism,
        rows.length).max(1)
      val chunk = (rows.length + k - 1) / k
      rows.grouped(chunk).map(PolledPartition.apply).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PolledReaderFactory

  /** Offset commit = the coalesced last-ack (poller.go:83-99). */
  override def commit(end: Offset): Unit =
    handle.commit(end.asInstanceOf[PollOffset].n)

  override def stop(): Unit = ()
}

private[sources] final case class PolledPartition(rows: Seq[Message])
    extends InputPartition

private[sources] class PolledReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[PolledPartition].rows.iterator
      private var current: Message = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(current.key),
        current.value,
        UTF8String.fromString(current.topic),
        ArrayBasedMapData(current.attributes,
          (k: Any) => UTF8String.fromString(k.asInstanceOf[String]),
          (v: Any) => UTF8String.fromString(v.asInstanceOf[String]))))
      override def close(): Unit = ()
    }
}
