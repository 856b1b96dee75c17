package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Semantics of the hash-based operators the DuckDB oracle can't express:
  * MinHash-LSH recall against exact Jaccard, SimHash self-consistency,
  * LSH ANN recall against brute-force cosine.
  */
class DedupSimilaritySpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf)
  lazy val emb = Tables.embeddings(spark, sf)

  test("minhash LSH finds every high-jaccard pair (recall on j >= 0.7)") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "lang",
        threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    val cand = Dedup.minhashNearDup(docs, "text", "doc_id", threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact -- cand
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("minhash emits no pair below its verification threshold") {
    val cand = Dedup.minhashNearDup(docs, "text", "doc_id", threshold = 0.5)
    val below = cand.filter(col("jaccard") < 0.5).count()
    assert(below == 0)
  }

  test("simhash: near-identical docs collide, hamming is symmetric-free") {
    val pairs = Dedup.simhashNearDup(docs, "text", "doc_id",
      prefixBits = 4, maxHamming = 16)
    val rows = pairs.collect()
    // candidate pairs are ordered and unique
    assert(rows.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    val distinct = rows.map(r => (r.getLong(0), r.getLong(1))).distinct
    assert(distinct.length == rows.length)
  }

  test("exact dedup keeps one row per fingerprint") {
    val deduped = Dedup.exactDedup(docs, "text", "doc_id")
    assert(deduped.count() == docs.select(
      graft.functions.TextFunctions.fingerprint(col("text"))).distinct().count())
  }

  test("LSH ANN recall@5 against brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(queries, emb, "vec_id", "embedding",
        dim = 64, k = 5, bits = 4, tables = 8, probes = 2)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // testdata embeddings are uniform random (no cluster structure), the
    // hardest case for LSH — multi-table OR-construction still has to
    // recover a solid share of the true top-5.
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, f"LSH recall too low: $recall%.2f")
    // approx returns at most k per query and only valid neighbors
    assert(approx.forall { case (q, n) => q != n })
  }

  test("IVF ANN recall@5 against brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 8)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // coarse one-cell-per-vector quantization on uniform random data:
    // nprobe=8 of 32 cells must still recover a meaningful share
    assert(recall >= 0.2, f"IVF recall too low: $recall%.2f")
    assert(approx.forall { case (q, n) => q != n })
  }

  test("cosine near-dup pairs match the brute-force definition") {
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      "label", threshold = 0.35)
    val rows = pairs.collect()
    assert(rows.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(rows.forall(r => r.getAs[Double]("cos") >= 0.35))
    // spot-check one pair against the unnormalized kernel
    if (rows.nonEmpty) {
      val r0 = rows.head
      val ids = Seq(r0.getAs[Long]("id_a"), r0.getAs[Long]("id_b"))
      val vecs = emb.filter(col("vec_id").isin(ids: _*))
        .orderBy("vec_id").collect()
        .map(_.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      val dot = vecs(0).zip(vecs(1)).map { case (a, b) => a * b }.sum
      val cos = dot / (math.sqrt(vecs(0).map(x => x * x).sum) *
        math.sqrt(vecs(1).map(x => x * x).sum))
      assert(math.abs(cos - r0.getAs[Double]("cos")) < 1e-9)
    }
  }

  test("winnowing fingerprints: shared-prefix docs share fingerprints") {
    val fps = Dedup.winnowFingerprints(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Seq[String]]("fps").toSet).toMap
    // every doc with >= window shingles has at least one fingerprint,
    // and fingerprint sets are far smaller than shingle counts
    assert(fps.values.count(_.nonEmpty) > fps.size / 2)
    // determinism
    val again = Dedup.winnowFingerprints(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Seq[String]]("fps").toSet).toMap
    assert(fps == again)
    // near-dup docs (high exact jaccard) overlap in winnow space
    val near = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "lang",
      threshold = 0.7).select("id_a", "id_b").collect()
    if (near.nonEmpty) {
      val overlapping = near.count { r =>
        (fps(r.getLong(0)) & fps(r.getLong(1))).nonEmpty
      }
      assert(overlapping.toDouble / near.length >= 0.9,
        "winnow fingerprints should overlap for near-duplicate docs")
    }
  }

  test("TopKSketch: exact regime matches groupBy; lossy regime keeps heavy hitters") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    // exact regime: capacity >> |distinct event_type|
    val sketch = udaf(graft.functions.TopKSketch(64))
    val got = ev.agg(sketch(col("event_type")).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e._1"), col("e._2")).as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(got == exact)
    // lossy regime: capacity 4 over a skewed stream still surfaces the
    // dominant item with count error <= n/capacity
    val n = 4000
    val skewed = ((1 to (n / 2)).map(_ => "hot") ++
      (1 to (n / 2)).map(i => s"cold_${i % 100}")).toDF("x")
    val small = udaf(graft.functions.TopKSketch(4))
    val lossy = skewed.agg(small(col("x")).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e._1"), col("e._2")).as[(String, Long)].collect().toMap
    assert(lossy.contains("hot"), "true heavy hitter must survive")
    assert(lossy("hot") <= n / 2 && lossy("hot") >= n / 2 - n / 4,
      s"count error exceeds n/capacity: ${lossy("hot")}")
  }

  test("connectedComponents labels are transitive and min-id-canonical") {
    import spark.implicits._
    // known graph: {1-2, 2-3} ∪ {10-11} ∪ {20-21, 21-22, 20-22}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("id_a", "id_b")
    val lbl = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    // long chain exercises multi-round propagation
    val chain = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    val chainLbl = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(1)).distinct
    assert(chainLbl.toSeq == Seq(0L))
  }

  test("native graft_shingles equals the Column tokenize→shingle formulation") {
    import graft.functions.TextFunctions._
    for (n <- Seq(2, 3, 5)) {
      val bad = docs.select(
          shingles(tokens(col("text")), n).as("hof"),
          shinglesN(col("text"), n).as("nat"))
        .filter(col("hof") =!= col("nat")).count()
      assert(bad == 0, s"shingle mismatch for n=$n")
    }
    // edge cases: empty, whitespace-only, fewer-than-n tokens, mixed case
    import spark.implicits._
    val edge = Seq("", "   ", "one", "one two", "  A  b\tC ", "x y z w")
      .toDF("text")
    val bad = edge.select(
        shingles(tokens(col("text")), 3).as("hof"),
        shinglesN(col("text"), 3).as("nat"))
      .filter(col("hof") =!= col("nat")).count()
    assert(bad == 0)
  }

  test("native graft_dot/graft_cosine are bit-identical to the HOF kernels") {
    import graft.functions.VectorFunctions._
    val pairs = emb.limit(50).select(col("vec_id"), col("embedding"))
      .crossJoin(emb.limit(50).select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .select(
        dotD(col("embedding"), col("e2")).as("d_hof"),
        dotN(col("embedding"), col("e2")).as("d_nat"),
        cosineD(col("embedding"), col("e2")).as("c_hof"),
        cosineN(col("embedding"), col("e2")).as("c_nat"))
    val bad = pairs.filter(
      col("d_hof") =!= col("d_nat") || col("c_hof") =!= col("c_nat")).count()
    assert(bad == 0, "native expressions must match HOF formulation bitwise")
  }

  test("knnLabel emits one deterministic majority vote per query") {
    val preds = Similarity.knnLabel(emb.filter(col("vec_id") < 20), emb,
      "vec_id", "embedding", "label", k = 10)
    val rows = preds.collect()
    assert(rows.length == 20)
    assert(rows.forall { r =>
      val v = r.getAs[Long]("votes"); v >= 1 && v <= 10
    })
    // deterministic across runs (ties broken by label id)
    val again = Similarity.knnLabel(emb.filter(col("vec_id") < 20), emb,
      "vec_id", "embedding", "label", k = 10).collect()
    assert(rows.map(_.toSeq).sortBy(_.toString).toSeq ==
      again.map(_.toSeq).sortBy(_.toString).toSeq)
  }
}
