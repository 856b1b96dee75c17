package graft.core

import org.apache.spark.sql.types._

/** The engine's message envelope — the Spark-native form of the
  * reference's row abstraction (`Message[T]`, /root/reference/types.go:10-26):
  * a routing key, an opaque byte payload, the originating topic, and a
  * flattened metadata map (the reference's `Attributes` chain,
  * types.go:28-30, collapsed to its key→value view at source time).
  *
  * Typed payloads (the reference's generic `T`, types.go:18) are layered on
  * by deserializing `value` into columns — see
  * [[graft.core.Transforms.deserializeJson]], the analogue of
  * `DeserializationSource` (types.go:169-195) — while the envelope columns
  * ride alongside.
  */
final case class Message(
    key: String,
    value: Array[Byte],
    topic: String,
    attributes: Map[String, String])

object Message {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("attributes", MapType(StringType, StringType))))

  def ofString(key: String, value: String, topic: String = "",
      attributes: Map[String, String] = Map.empty): Message =
    Message(key, value.getBytes("UTF-8"), topic, attributes)

  /** The reference's Attributes chain-walk (types.go:28-30): provenance is
    * a linked chain of metadata layers, and reading key k walks the chain
    * outermost-layer-first. Sources collapse the chain to its key→value
    * view at envelope-construction time; this is that merge — layers given
    * innermost-first, later (outer) layers winning on key conflict. */
  def mergeAttributes(layers: Map[String, String]*): Map[String, String] =
    layers.foldLeft(Map.empty[String, String])(_ ++ _)

  def valueString(m: Message): String = new String(m.value, "UTF-8")
}
