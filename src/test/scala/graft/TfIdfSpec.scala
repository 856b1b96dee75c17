package graft

import graft.functions.TextFunctions
import graft.ops.TfIdf
import org.apache.spark.sql.functions._

/** TF-IDF semantics: the run-length term-count kernel against hand-counted
  * documents, idf math against the textbook formula, keyword ranking and
  * tie-breaks, and the zero-shuffle plan shape of the TF half. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("termCounts: run-length counts equal hand-counted term frequencies") {
    val d = Seq(
      (1L, "b a b a b"),  // a:2 b:3
      (2L, "x"),          // x:1
      (3L, "")).toDF("doc_id", "text") // "" tokenizes to [""] → ("", 1)
    val got = d.select(col("doc_id"),
        TextFunctions.termCounts(col("text")).as("tc"))
      .as[(Long, Seq[(String, Int)])].collect().toMap
    assert(got(1L).toMap == Map("a" -> 2, "b" -> 3), s"doc 1: ${got(1L)}")
    assert(got(2L) == Seq(("x", 1)), s"doc 2: ${got(2L)}")
    assert(got(3L) == Seq(("", 1)), s"doc 3: ${got(3L)}")
    // terms emitted in sorted order, each exactly once
    assert(got(1L).map(_._1) == got(1L).map(_._1).sorted.distinct)
  }

  test("termCounts agrees with explode+groupBy on real corpus text") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
    val kernel = docs.select(col("doc_id"),
        explode(TextFunctions.termCounts(col("text"))).as("p"))
      .select(col("doc_id"), col("p.term"), col("p.cnt").cast("long").as("cnt"))
    val naive = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    assert(kernel.exceptAll(naive).isEmpty && naive.exceptAll(kernel).isEmpty,
      "kernel and explode+groupBy term counts must be identical")
  }

  test("tfIdf: textbook cnt·ln(N/df) on a hand-computed corpus") {
    // 4 docs; "rare" appears in 1 doc (twice), "common" in all 4
    val d = Seq(
      (1L, "common rare rare"), (2L, "common"), (3L, "common"),
      (4L, "common")).toDF("doc_id", "text")
    val scores = TfIdf.tfIdf(d, "doc_id", "text")
      .filter(col("doc_id") === 1L)
      .select("term", "tfidf").as[(String, Double)].collect().toMap
    assert(math.abs(scores("rare") - 2.0 * math.log(4.0 / 1.0)) < 1e-12)
    assert(math.abs(scores("common") - 1.0 * math.log(4.0 / 4.0)) < 1e-12)
  }

  test("keywords: rank by score desc, ties broken on term; k respected") {
    val d = Seq(
      (1L, "zz zz aa aa common"), (2L, "common qq")).toDF("doc_id", "text")
    val kw = TfIdf.keywords(d, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L)
      .orderBy("rnk").select("term").as[String].collect()
    // aa and zz tie on score (cnt 2, df 1) → term ascending breaks it
    assert(kw.toSeq == Seq("aa", "zz"), s"got ${kw.toSeq}")
    assert(TfIdf.keywords(d, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 1L).count() == 1)
  }

  test("plan shape: TF half is narrow; DF agg is the only pre-join shuffle") {
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    // the per-row kernel alone must not shuffle
    val kernelPlan = d.select(TextFunctions.termCounts(col("text")))
      .queryExecution.executedPlan.toString
    assert(!kernelPlan.contains("Exchange"),
      s"termCounts must stay narrow:\n$kernelPlan")
    // full tfIdf: expect shuffles only for the DF groupBy and the idf
    // join — never a (doc, term) occurrence shuffle (no shuffle whose
    // partitioning carries the doc id before the window stage)
    val p = TfIdf.tfIdf(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3,
      s"tfIdf must shuffle at most thrice (DF agg + join sides), saw $exchanges:\n${p.take(1200)}")
    assert(!p.contains("hashpartitioning(doc_id"),
      s"TF relation must not be shuffled by doc id:\n${p.take(1200)}")
  }
}
