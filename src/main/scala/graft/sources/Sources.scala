package graft.sources

import graft.core.{Message, Source}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Source connectors (SURVEY §2.2). Each wraps a Spark reader in the
  * engine's envelope schema where the reference's analogue is
  * byte-oriented.
  */

/** Columnar table scan — the workhorse for the testdata tables. */
final case class ParquetSource(path: String, maxFilesPerTrigger: Option[Int] = None)
    extends Source {
  def batch(spark: SparkSession): DataFrame = spark.read.parquet(path)
  def stream(spark: SparkSession): DataFrame = {
    val base = spark.readStream.schema(spark.read.parquet(path).schema)
    maxFilesPerTrigger.fold(base)(n => base.option("maxFilesPerTrigger", n))
      .parquet(path)
  }
}

/** The reference's Scanner (x/scanner/scanner.go:14-105): split a byte
  * stream into messages on a configurable delimiter. Files stand in for
  * the io.Reader; `lineSep` carries the custom multi-byte delimiter.
  * Emits the envelope schema with the token as `value`.
  */
final case class ScannerSource(path: String, delimiter: String = "\n")
    extends Source {
  private def envelope(df: DataFrame): DataFrame =
    df.select(
      lit("").as("key"),
      col("value").cast("binary").as("value"),
      lit("").as("topic"),
      map(lit("source"), lit(path)).as("attributes"))

  def batch(spark: SparkSession): DataFrame =
    envelope(spark.read.option("lineSep", delimiter).text(path))
  def stream(spark: SparkSession): DataFrame =
    envelope(spark.readStream.option("lineSep", delimiter).text(path))
}

/** In-memory source for tests — the reference's memory connector
  * (x/memory/memory.go:10-31) ≈ `MemoryStream[Message]`. */
final class MemoryMessageSource(spark: SparkSession) extends Source {
  implicit private val enc: org.apache.spark.sql.Encoder[Message] =
    Encoders.product[Message]
  val stream0: MemoryStream[Message] =
    new MemoryStream[Message](0, spark, None)
  def add(ms: Seq[Message]): Unit = stream0.addData(ms)
  def batch(spark: SparkSession): DataFrame = stream0.toDF()
  def stream(spark: SparkSession): DataFrame = stream0.toDF()
}

/** Synthetic rate source (rows/sec) wrapped in the envelope — useful as a
  * load generator for streaming tests. */
final case class RateSource(rowsPerSecond: Int) extends Source {
  def batch(spark: SparkSession): DataFrame =
    throw new UnsupportedOperationException("rate source is streaming-only")
  def stream(spark: SparkSession): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(col("value").cast("string").as("key"),
        col("value").cast("string").cast("binary").as("value"),
        lit("rate").as("topic"),
        map(lit("ts"), col("timestamp").cast("string")).as("attributes"))
}

/** Fan-in union — the reference's MultiSource (x/multi/multisrc.go:18-81):
  * UNION ALL of N sources (no dedup), streaming-unioned when streaming. */
final case class MultiSource(sources: Seq[Source]) extends Source {
  require(sources.nonEmpty, "MultiSource needs at least one source")
  def batch(spark: SparkSession): DataFrame =
    sources.map(_.batch(spark)).reduce(_.unionByName(_))
  def stream(spark: SparkSession): DataFrame =
    sources.map(_.stream(spark)).reduce(_.unionByName(_))
}
