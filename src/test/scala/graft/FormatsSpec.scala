package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion-format surface beyond parquet: CSV with the three
  * malformed-record policies (PERMISSIVE + corrupt-record column,
  * DROPMALFORMED, FAILFAST) and an ORC round-trip — the formats a kawa
  * user's upstream feeds actually arrive in.
  */
class FormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", DoubleType),
    StructField("name", StringType)))

  private def writeCsv(dir: String): Unit = {
    val lines = Seq(
      "1,1.5,alpha",
      "2,2.5,beta",
      "not-a-long,oops,gamma", // malformed: id unparseable
      "4,4.5,delta")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part.csv"),
      String.join("\n", lines: _*).getBytes)
  }

  test("CSV PERMISSIVE keeps malformed rows with a corrupt-record column") {
    val dir = tmpDir("csv-perm")
    writeCsv(dir)
    val df = spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache() // corrupt-record column requires a materialized scan
    assert(df.count() == 4)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    assert(bad.first().getAs[String]("_corrupt_record")
      .startsWith("not-a-long"))
    // parsed columns survive on the good rows
    assert(df.filter(col("id").isNotNull).count() == 3)
    df.unpersist()
  }

  test("CSV DROPMALFORMED silently drops; FAILFAST raises") {
    val dir = tmpDir("csv-drop")
    writeCsv(dir)
    val dropped = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").csv(dir)
    // collect(), not count(): count pushdown skips field parsing, so
    // malformed detection would never run and all 4 rows would count
    assert(dropped.collect().length == 3)
    val failfast = spark.read.schema(schema)
      .option("mode", "FAILFAST").csv(dir)
    intercept[org.apache.spark.SparkException] { failfast.collect() }
  }

  test("ORC round-trip preserves schema and values") {
    val dir = tmpDir("orc-rt")
    val src = Tables.events(spark, sf)
      .select("event_id", "event_type", "value")
    src.write.mode("overwrite").orc(s"$dir/ev")
    val back = spark.read.orc(s"$dir/ev")
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }
}
