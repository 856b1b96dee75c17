package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark for [[graft.plans.RangeJoinRule]]: the identical
  * point-in-interval inequality join timed with the rule off (Spark's
  * native broadcast-nested-loop plan) and on (bucketed equi-join plan).
  * Prints one JSON line. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.RangeBench"
  *
  * The asymmetry grows with scale — the naive plan is O(|probe|·|iv|)
  * per broadcast batch while the bucketed one is O(|probe| + |iv|·rep)
  * — so even at sf0.01 the gap is an order of magnitude; at sf0.1 the
  * naive side becomes minutes while the rewritten side stays ~1 s
  * (same curve the VERDICT's 100 TB question asks about).
  */
object RangeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def query(s: SparkSession): DataFrame = {
      val ev = Tables.events(s, sfDir)
      val probe = ev.select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
      val iv = ev.filter(col("event_type") === "purchase")
        .select(unix_micros(col("ts")).as("w_start"),
          (unix_micros(col("ts")) + lit(1800L * 1000000L)).as("w_end"),
          col("event_id").as("purchase_id"))
      // deliberately NO equi-key: the pure interval join is the case
      // Spark can only nested-loop
      probe.join(iv, probe("us") >= iv("w_start") &&
          probe("us") <= iv("w_end"))
        .agg(count(lit(1)).as("n_pairs"))
    }

    def time(): Double = {
      query(spark).write.format("noop").mode("overwrite").save() // warm plan
      val t0 = System.nanoTime
      query(spark).write.format("noop").mode("overwrite").save()
      (System.nanoTime - t0) / 1e9
    }

    spark.conf.unset(graft.plans.RangeJoinRule.BIN_CONF)
    val naive = time()
    spark.conf.set(graft.plans.RangeJoinRule.BIN_CONF,
      (1800L * 1000000L).toString)
    val bucketed = time()
    // sanity: identical result
    spark.conf.unset(graft.plans.RangeJoinRule.BIN_CONF)
    val nNaive = query(spark).collect()(0).getLong(0)
    spark.conf.set(graft.plans.RangeJoinRule.BIN_CONF,
      (1800L * 1000000L).toString)
    val nBucketed = query(spark).collect()(0).getLong(0)
    require(nNaive == nBucketed, s"result drift: $nNaive vs $nBucketed")

    println(f"""{"metric":"range_join","naive_sec":$naive%.3f,""" +
      f""""bucketed_sec":$bucketed%.3f,""" +
      f""""speedup":${naive / bucketed}%.1f,"n_pairs":$nNaive,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
