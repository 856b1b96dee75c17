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
    // all ordered two-word phrases over the top-30 words — the SAME
    // 30-word enumeration as r11, so the n8..n870 rows stay comparable
    // round-over-round (the ≥10⁴-term rows below use this 870-phrase
    // matcher core plus inert junk, holding match density fixed)
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(desc("count"), asc("w"))
      .limit(30).collect().map(_.getString(0)).toSeq
    val phrases = for (a <- vocab; b <- vocab if a != b) yield s"$a $b"

    def acQuery(pats: Seq[String], backend: String = "auto"): DataFrame =
      Tables.documents(spark, sfDir)
        .select(graft.functions.TextFunctions
          .multiPatternCounts(col("text"), pats, backend).as("h"))
        .agg(sum(aggregate(col("h"), lit(0L), (acc, x) => acc + x)).as("occ"))

    def naiveQuery(pats: Seq[String]): DataFrame = {
      val perPat: Seq[Column] = pats.map(p =>
        ((length(col("text")) - length(replace(col("text"), lit(p), lit("")))) /
          lit(p.length)).cast("long"))
      Tables.documents(spark, sfDir)
        .select(perPat.reduce(_ + _).as("o"))
        .agg(sum(col("o")).as("occ"))
    }

    // by-VALUE df: the warm rep plans + codegens + builds the automaton
    // once, and the timed rep re-executes the same physical plan — the
    // number measures the scan, not Catalyst tree-walking
    def time(df: DataFrame): (Double, Long) = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime
      val n = df.collect()(0).getLong(0)
      ((System.nanoTime - t0) / 1e9, n)
    }

    // the naive side stops at 256 terms: past that its expression tree
    // first loses whole-stage codegen ("Code grows beyond 64 KB") and
    // then overflows the optimizer stack around ~900 leaves — the
    // dictionary-sized plan is itself the scaling failure the constant-
    // size automaton reference object avoids. 870 is the r11 dense
    // ceiling row (kept for round-over-round comparability).
    val sizes = Seq(8, 64, 256, 870)
    val small = sizes.map { n =>
      val pats = phrases.take(n)
      val ac = new graft.functions.AcAutomaton(
        pats.map(_.getBytes("UTF-8")).toArray)
      val backend = if (ac.isDense) "dense" else "csr"
      val (tAc, nAc) = time(acQuery(pats))
      if (n <= 256) {
        val (tNaive, nNaive) = time(naiveQuery(pats))
        require(nAc == nNaive, s"count drift at n=$n: $nAc vs $nNaive")
        f""""n$n":{"ac_sec":$tAc%.3f,"naive_sec":$tNaive%.3f,""" +
          f""""speedup":${tNaive / tAc}%.1f,"occurrences":$nAc,""" +
          f""""backend":"$backend","table_kb":${ac.approxBytes / 1024}}"""
      } else
        f""""n$n":{"ac_sec":$tAc%.3f,"naive_sec":null,"occurrences":$nAc,""" +
          f""""backend":"$backend","table_kb":${ac.approxBytes / 1024}}"""
    }
    // FLAT-CURVE rows: the 870 matching phrases plus inert junk terms
    // (deterministic [a-z]{10,14} strings with a 'zq' prefix absent from
    // the 31-word corpus vocabulary). Occurrences are REQUIRED equal to
    // the n870 row, so any time growth is pure dictionary-size overhead —
    // the variable the O(len+matches) claim is about. These rows use the
    // SPARSE hits kernel: the dense count vector is itself O(|dict|) per
    // row (allocate + fill + downstream-scan 400 KB per document at 10⁵
    // terms), which would silently re-linearize the walk no matter how
    // good the automaton is. At 10⁴ terms both backends run (dense rows
    // ~75 MiB); at 10⁵ the dense store would be ~700 MiB (reported as
    // projected kb) and CSR is the operating point.
    val rnd = new scala.util.Random(12)
    def junk(k: Int): Seq[String] = (0 until k).map(_ =>
      "zq" + (0 until (8 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val base870 = phrases.take(870)
    def hitsQuery(pats: Seq[String], backend: String = "auto"): DataFrame =
      Tables.documents(spark, sfDir)
        .select(graft.functions.TextFunctions
          .multiPatternHits(col("text"), pats, backend).as("h"))
        .agg(sum(aggregate(col("h"), lit(0L),
          (acc, x) => acc + x.getField("cnt"))).as("occ"))
    val (t870, n870occ) = time(hitsQuery(base870))
    val mixed = Seq(10000, 100000).map { n =>
      val pats = base870 ++ junk(n - 870)
      val ac = new graft.functions.AcAutomaton(
        pats.map(_.getBytes("UTF-8")).toArray)
      val backend = if (ac.isDense) "dense" else "csr"
      val (tAc, nAc) = time(hitsQuery(pats))
      require(nAc == n870occ, s"junk terms changed counts at n=$n: $nAc vs $n870occ")
      // projected dense-backend size, computed from the row layout
      // (256 resolved-goto ints per node), not the 1-node-per-KiB
      // numeric coincidence
      val denseKb = ac.nNodes.toLong * 256L * java.lang.Integer.BYTES / 1024L
      val denseField =
        if (n <= 10000) {
          val (tDense, nDense) = time(hitsQuery(pats, "dense"))
          require(nAc == nDense, s"backend drift at n=$n")
          f""""dense_sec":$tDense%.3f,"dense_table_kb":$denseKb"""
        } else
          f""""dense_sec":null,"dense_table_kb":$denseKb"""
      f""""mixed$n":{"ac_sec":$tAc%.3f,"vs_n870_sec":$t870%.3f,"occurrences":$nAc,""" +
        f""""backend":"$backend","table_kb":${ac.approxBytes / 1024},$denseField}"""
    }
    println(s"""{"metric":"blocklist_scan",${(small ++ mixed).mkString(",")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
