package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark for [[graft.functions.MultiPatternCounts]] (the
  * Aho–Corasick blocklist kernel): total corpus occurrence counts for an
  * N-term dictionary, computed (a) in one automaton pass per row and
  * (b) the naive way — one `length(replace(...))` scan per term. Prints
  * one JSON line per dictionary size. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BlocklistBench"
  *
  * The naive shape is O(N·len) per document — linear in dictionary
  * size — while the automaton is O(len + matches) whatever N is, so the
  * gap widens with every term a real blocklist adds (thousands of
  * terms is the operating point for badword/boilerplate lists).
  */
object BlocklistBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // dictionary drawn from the corpus vocabulary so hits are plentiful:
    // all ordered two-word phrases over the most frequent words
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(desc("count"), asc("w"))
      .limit(30).collect().map(_.getString(0)).toSeq
    val phrases = for (a <- vocab; b <- vocab if a != b) yield s"$a $b"

    def acQuery(pats: Seq[String]): DataFrame =
      Tables.documents(spark, sfDir)
        .select(graft.functions.TextFunctions
          .multiPatternCounts(col("text"), pats).as("h"))
        .agg(sum(aggregate(col("h"), lit(0L), (acc, x) => acc + x)).as("occ"))

    def naiveQuery(pats: Seq[String]): DataFrame = {
      val perPat: Seq[Column] = pats.map(p =>
        ((length(col("text")) - length(replace(col("text"), lit(p), lit("")))) /
          lit(p.length)).cast("long"))
      Tables.documents(spark, sfDir)
        .select(perPat.reduce(_ + _).as("o"))
        .agg(sum(col("o")).as("occ"))
    }

    def time(df: => DataFrame): (Double, Long) = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime
      val n = df.collect()(0).getLong(0)
      ((System.nanoTime - t0) / 1e9, n)
    }

    // the naive side stops at 256 terms: past that its expression tree
    // first loses whole-stage codegen ("Code grows beyond 64 KB") and
    // then overflows the optimizer stack around ~900 leaves — the
    // dictionary-sized plan is itself the scaling failure the constant-
    // size automaton reference object avoids
    val sizes = Seq(8, 64, 256, phrases.length)
    val results = sizes.map { n =>
      val pats = phrases.take(n)
      val (tAc, nAc) = time(acQuery(pats))
      if (n <= 256) {
        val (tNaive, nNaive) = time(naiveQuery(pats))
        require(nAc == nNaive, s"count drift at n=$n: $nAc vs $nNaive")
        f""""n$n":{"ac_sec":$tAc%.3f,"naive_sec":$tNaive%.3f,""" +
          f""""speedup":${tNaive / tAc}%.1f,"occurrences":$nAc}"""
      } else
        f""""n$n":{"ac_sec":$tAc%.3f,"naive_sec":null,"occurrences":$nAc}"""
    }
    println(s"""{"metric":"blocklist_scan",${results.mkString(",")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
