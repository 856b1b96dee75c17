package graft.sources

import graft.core.Message

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue, CopyOnWriteArrayList}
import scala.jdk.CollectionConverters._

/** In-process pub/sub broker — the MQTT connector pair (S5/S6) with the
  * broker dependency replaced by an in-JVM topic bus, so the
  * subscribe-callback→buffer→micro-batch→ack-on-commit shape of the
  * reference's MQTT source (/root/reference/x/mqtt/mqtt.go:200-285) and
  * the publish-then-ack shape of its destination (mqtt.go:96-198) are
  * demonstrated end-to-end without a network broker.
  *
  * Mapping, piece by piece:
  *   - broker callback feeding a channel (mqtt.go:240-254) →
  *     [[InProcBroker.publish]] enqueues onto every matching
  *     subscription's buffer; [[Subscription.poll]] drains it into
  *     micro-batches via the O10 [[PolledSource]] adapter.
  *   - broker `message.Ack` on delivery (mqtt.go:249) →
  *     [[Subscription.ack]], invoked by the poller adapter on offset
  *     commit — i.e. only after the micro-batch's outputs are durable.
  *   - envelope: Key = broker-assigned MessageID, Topic = the publish
  *     topic (mqtt.go:278-285), QoS carried as an attribute.
  *   - topic filters: MQTT semantics — `+` matches one level, trailing
  *     `#` matches any suffix, default filter `#` (mqtt.go:227, default
  *     topic "#").
  *
  * Wire-protocol swap-in point: a real network MQTT client (the
  * reference uses paho — broker connection, QoS, reconnect watch,
  * mqtt.go:96-285) plugs in WITHOUT touching any pipeline code, because
  * both halves are already behind the generic interfaces:
  *   - source side: implement [[graft.sources.Poller]] whose
  *     subscribe-callback enqueues into a local buffer and whose
  *     `poll(max)`/`ack(n)` drain/acknowledge it — [[PolledSource]]
  *     turns that into an offset-committed DSv2 stream exactly as it
  *     does for [[Subscription]] here (ack-on-commit preserved);
  *   - sink side: swap [[graft.sinks.Sinks.BrokerSink]]'s
  *     `ForeachWriter` for one that opens the network client in
  *     `open()` and publishes per row — the at-least-once
  *     publish-then-commit contract is unchanged.
  * This sandbox has no network egress, so the wire client itself is
  * intentionally out of the build; the semantics it must satisfy are
  * pinned by ConnectorSpec's S5/S6 round-trip tests.
  */
final class InProcBroker {
  private val nextId = new AtomicLong(0L)
  private val subs = new CopyOnWriteArrayList[Subscription]()

  /** MQTT topic-filter match: levels split on '/', '+' matches exactly
    * one level, a trailing '#' matches the rest. */
  def matches(filter: String, topic: String): Boolean = {
    val f = filter.split("/", -1)
    val t = topic.split("/", -1)
    var i = 0
    while (i < f.length) {
      if (f(i) == "#") return true
      if (i >= t.length) return false
      if (f(i) != "+" && f(i) != t(i)) return false
      i += 1
    }
    i == t.length
  }

  def publish(topic: String, payload: Array[Byte], qos: Int = 1): Unit = {
    val id = nextId.incrementAndGet()
    val m = Message(id.toString, payload, topic, Map("qos" -> qos.toString))
    subs.asScala.foreach(s => if (matches(s.filter, topic)) s.enqueue(m))
  }

  def publishString(topic: String, payload: String): Unit =
    publish(topic, payload.getBytes("UTF-8"))

  def subscribe(filter: String = "#"): Subscription = {
    val s = new Subscription(filter)
    subs.add(s)
    s
  }

  def unsubscribe(s: Subscription): Unit = subs.remove(s)
}

/** One subscriber's buffered view of the broker — a [[Poller]], so the
  * MQTT source IS the O10 adapter applied to a subscription: wrap it in
  * [[PolledSource]] (or call [[Subscription.source]]) and stream. */
final class Subscription(val filter: String) extends Poller {
  private val queue = new ConcurrentLinkedQueue[Message]()
  private val ackedCount = new AtomicLong(0L)

  private[sources] def enqueue(m: Message): Unit = queue.add(m)

  override def poll(max: Int): Seq[Message] = {
    val out = Vector.newBuilder[Message]
    var n = 0
    var m = queue.poll()
    while (m != null) {
      out += m
      n += 1
      m = if (n < max) queue.poll() else null
    }
    out.result()
  }

  /** Broker ack on durable delivery (mqtt.go:249) — fired by the poller
    * adapter's offset commit, once per committed micro-batch. */
  override def ack(n: Long): Unit = ackedCount.addAndGet(n)

  def acked: Long = ackedCount.get()
  def pending: Int = queue.size()

  /** The S5 source: this subscription as a streaming micro-batch source. */
  def source(batchSize: Int = 100): PolledSource = PolledSource(this, batchSize)
}

/** Lets the publish sink run on executors without serializing the broker:
  * writers look the broker up by id at open() time (an MQTT client would
  * open a connection here instead — same lifecycle, mqtt.go:200-224). */
object BrokerRegistry {
  private val brokers = new ConcurrentHashMap[String, InProcBroker]()
  def register(b: InProcBroker): String = {
    val id = java.util.UUID.randomUUID().toString
    brokers.put(id, b)
    id
  }
  def get(id: String): InProcBroker = {
    val b = brokers.get(id)
    require(b != null, s"no broker registered under id $id")
    b
  }
}
