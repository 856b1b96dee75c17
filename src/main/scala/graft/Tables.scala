package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet; `events.ts` is written as
  * parquet TIMESTAMP(NANOS) which Spark cannot read as a timestamp —
  * sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
  * (see [[Sessions.builder]]) and [[events]] converts the resulting
  * nanosecond long to a microsecond TimestampType column (truncating,
  * which matches DuckDB's ns→µs truncation on read).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` normalized to a µs TimestampType column.
    * The driver has shipped this file with two physical types so far:
    * TIMESTAMP(NANOS) (reads as a ns long under nanosAsLong — rounds
    * ≤8) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as
    * TIMESTAMP_NTZ — r9 regeneration). Both normalize to the same UTC
    * instant here (session tz is pinned UTC), so every downstream
    * consumer — unix_micros, window(), watermarks — sees one type
    * regardless of which generation of the file is on disk. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType => // nanosAsLong path: ns long → µs timestamp (floor)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // naive µs → same wall clock, UTC-labeled
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}

/** One place to build correctly-configured sessions (UTC, AQE, ns-long),
  * with the engine's native expressions (graft_dot / graft_cosine / …)
  * and the range-join optimizer rule injected via
  * SparkSessionExtensions. */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions { e =>
        graft.functions.VectorExpressions.inject(e)
        graft.plans.RangeJoinRule.inject(e)
      }
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
}
