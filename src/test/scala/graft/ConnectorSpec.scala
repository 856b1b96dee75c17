package graft

import graft.core.Transforms
import graft.sinks.Sinks
import graft.sources.{MultiSource, ParquetSource, ScannerSource}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Connector behaviors from the reference's test fixtures:
  * multi-byte-delimiter scanning (test/stream_test.go:43-55), the
  * s3-style gzip NDJSON time-partitioned layout (x/s3/s3.go:143-148),
  * fan-in union (x/multi/multisrc.go), fan-out tee (x/multi/multidest.go).
  */
class ConnectorSpec extends SparkSpec {

  test("scanner: custom multi-byte delimiter, final unterminated token") {
    val delim = "0x0x0x0x0" // the reference's own fixture delimiter
    val toks = Seq("alpha", "beta", "gamma")
    val f = Files.createTempFile("scan", ".txt")
    Files.writeString(f, toks.mkString(delim)) // no trailing delim
    val df = ScannerSource(f.toString, delim).batch(spark)
    val vals = df.collect().map(r => new String(r.getAs[Array[Byte]]("value"), "UTF-8"))
    assert(vals.sorted.toSeq == toks.sorted)
    assert(df.columns.toSeq == Seq("key", "value", "topic", "attributes"))
  }

  test("deserializeJson keeps the envelope alongside parsed columns") {
    import org.apache.spark.sql.types._
    val src = new graft.sources.MemoryMessageSource(spark)
    src.add(Seq(graft.core.Message.ofString("k1", """{"a":1,"b":"x"}""", "top")))
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val q = graft.core.Pipeline.from(src)
      .via(Transforms.deserializeJson(schema))
      .start(spark, Sinks.MemorySink("deser_out"))
    graft.streaming.StreamingOps.runToCompletion(q)
    val row = spark.table("deser_out").collect().head
    assert(row.getAs[String]("key") == "k1")
    assert(row.getAs[String]("topic") == "top")
    assert(row.getAs[Long]("a") == 1L)
    assert(row.getAs[String]("b") == "x")
  }

  test("ndjson gzip sink writes hour-partitioned .gz objects") {
    val out = tmpDir("ndjson")
    val df = Tables.events(spark, sf).limit(50)
    Sinks.NdjsonGzipSink(out, "ts").writeBatch(df)
    val files = Files.walk(Paths.get(out)).toArray.map(_.toString)
    val gz = files.filter(_.endsWith(".json.gz"))
    assert(gz.nonEmpty, "no gzip objects written")
    assert(gz.forall(_.matches(".*/year=\\d{4}/month=\\d{2}/day=\\d{2}/hour=\\d{2}/.*")),
      s"unexpected layout: ${gz.head}")
    // round-trips through the json reader
    val back = spark.read.json(s"$out/year=*/month=*/day=*/hour=*/*.json.gz")
    assert(back.count() == 50)
  }

  test("attributes chain: layered provenance merges, later layer wins") {
    // the reference's Attributes chain-walk (types.go:28-30): an outer
    // layer shadows inner keys; both the Scala-side merge and the Column
    // overlay agree, and the merged map rides through a pipeline.
    val inner = Map("source" -> "scanner", "host" -> "a")
    val outer = Map("source" -> "mqtt", "topic" -> "t/1")
    val merged = graft.core.Message.mergeAttributes(inner, outer)
    assert(merged == Map("source" -> "mqtt", "host" -> "a", "topic" -> "t/1"))

    val src = new graft.sources.MemoryMessageSource(spark)
    src.add(Seq(graft.core.Message.ofString("k", "v", "top", inner)))
    val q = graft.core.Pipeline.from(src)
      .via(df => df.withColumn("attributes", Transforms.layerAttributes(
        col("attributes"),
        map(lit("source"), lit("mqtt"), lit("topic"), lit("t/1")))))
      .start(spark, Sinks.MemorySink("attr_out"))
    graft.streaming.StreamingOps.runToCompletion(q)
    val got = spark.table("attr_out").collect().head
      .getAs[Map[String, String]]("attributes")
    assert(got == merged)
    // null inner layer reads as empty
    val nulls = spark.sql("SELECT CAST(NULL AS MAP<STRING,STRING>) AS a")
      .select(Transforms.layerAttributes(col("a"), map(lit("k"), lit("v"))).as("m"))
      .collect().head.getAs[Map[String, String]]("m")
    assert(nulls == Map("k" -> "v"))
  }

  test("multi-source union and tee sink fan-out") {
    val li = s"$sf/lineitem.parquet"
    val merged = MultiSource(Seq(ParquetSource(li), ParquetSource(li))).batch(spark)
    assert(merged.count() == 2 * spark.read.parquet(li).count())

    val outA = tmpDir("teeA")
    val outB = tmpDir("teeB")
    val tee = Sinks.TeeSink(Seq(Sinks.ParquetSink(outA), Sinks.ParquetSink(outB)))
    tee.writeBatch(Tables.nation(spark, sf))
    assert(spark.read.parquet(outA).count() == 25)
    assert(spark.read.parquet(outB).count() == 25)
  }
}
