package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._

/** Curation-operator semantics beyond what the DuckDB-oracled registry
  * queries pin: the decontamination filter drops exactly the overlapping
  * documents, the hash split is deterministic and hits its fraction, and
  * the repetition score orders degenerate text above novel text.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)

  test("decontaminate drops exactly the docs sharing a shingle with the benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely different sentence about spark engines here"),
      (3L, "we mention the quick brown fox in passing today"), // shares 'the quick brown' etc.
      (4L, "nothing in common with anything else at all now"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox ate")).toDF("doc_id", "text")

    val counts = Curation.contaminationCounts(corpus, "text", "doc_id", bench, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) > 0 && counts(3L) > 0, s"overlapping docs must count: $counts")
    assert(counts(2L) == 0 && counts(4L) == 0, s"clean docs must count zero: $counts")

    val kept = Curation.decontaminate(corpus, "text", "doc_id", bench, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L), s"expected clean docs only, got $kept")
  }

  test("contaminationReport: per-bench-item leak counts over a hand-built corpus") {
    val corpus = Seq(
      (1L, "a b c x"),   // trigrams: "a b c", "b c x"
      (2L, "b c d y"),   // trigrams: "b c d", "c d y"
      (3L, "q r s t"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "a b c d"), // trigrams "a b c" (in doc 1), "b c d" (in doc 2)
      (200L, "m m m"))   // trigram "m m m" — nowhere in the corpus
      .toDF("doc_id", "text")
    val rep = Curation.contaminationReport(corpus, "text", bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rep(100L) == ((2L, 2L, 2L)),
      s"both bench trigrams leak, one corpus doc each: ${rep(100L)}")
    assert(rep(200L) == ((1L, 0L, 0L)),
      s"unleaked item reports zero: ${rep(200L)}")
  }

  test("hashSplit: deterministic, exhaustive, and near the requested fraction") {
    val split1 = Curation.hashSplit(docs, "doc_id", trainFrac = 0.8)
    val split2 = Curation.hashSplit(docs, "doc_id", trainFrac = 0.8)
    // deterministic: same doc → same split on re-evaluation
    assert(split1.select("doc_id", "split").except(
      split2.select("doc_id", "split")).isEmpty)
    val bydoc = split1.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bydoc.values.sum
    assert(bydoc.keySet == Set("train", "test"), s"unexpected splits: $bydoc")
    val frac = bydoc("train").toDouble / total
    assert(math.abs(frac - 0.8) < 0.05, s"train fraction $frac too far from 0.8")
  }

  test("sampleStratified: per-stratum rates honored, deterministic, subset of input") {
    val s1 = Curation.sampleStratified(docs, "doc_id", "lang",
      fractions = Map("en" -> 0.5), defaultFrac = 0.1)
    val s2 = Curation.sampleStratified(docs, "doc_id", "lang",
      fractions = Map("en" -> 0.5), defaultFrac = 0.1)
    assert(s1.select("doc_id").except(s2.select("doc_id")).isEmpty, "must be deterministic")
    val total = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s1.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = kept.getOrElse("en", 0L).toDouble / total("en")
    assert(math.abs(enRate - 0.5) < 0.1, s"en rate $enRate too far from 0.5")
    total.keys.filterNot(_ == "en").foreach { l =>
      val r = kept.getOrElse(l, 0L).toDouble / total(l)
      assert(r < 0.3, s"stratum $l rate $r should be near 0.1")
    }
  }

  test("sampleStratified: boundary fractions — 1.0 keeps every row, 0.0 keeps none") {
    // f = 1.0 used to round to the 5-char threshold "10000", which kept
    // only digests starting with '0' (~6%); the "g" sentinel keeps all.
    val n = docs.count()
    val all = Curation.sampleStratified(docs, "doc_id", "lang",
      fractions = Map.empty, defaultFrac = 1.0)
    assert(all.count() == n, "defaultFrac=1.0 must keep every row")
    val mixed = Curation.sampleStratified(docs, "doc_id", "lang",
      fractions = Map("en" -> 1.0), defaultFrac = 0.0)
    val total = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = mixed.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("en" -> total("en")),
      s"en at 1.0 keeps all, every other stratum at 0.0 keeps none: $kept")
    // near-1 fractions must not overflow the 4-hex threshold either
    val near = Curation.sampleStratified(docs, "doc_id", "lang",
      fractions = Map.empty, defaultFrac = 0.999999)
    assert(near.count() >= n - (n >> 8), "f→1 must keep ~all rows")
  }

  test("hashSplit: trainFrac just under 1.0 routes ~everything to train") {
    val bydoc = Curation.hashSplit(docs, "doc_id", trainFrac = 0.999999)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bydoc.values.sum
    assert(bydoc.getOrElse("train", 0L).toDouble / total > 0.99,
      s"trainFrac≈1 must not overflow the threshold: $bydoc")
  }

  test("packByTokenBudget: packs contiguous, start-offset assignment, totals add up") {
    val d = Seq(
      (1L, "en", "a b c d e"),        // 5 tokens, offsets 0-4  → pack 0
      (2L, "en", "f g h i j k"),      // 6 tokens, offsets 5-10 → pack 0
      (3L, "en", "l m n o"),          // 4 tokens, offset 11    → pack 1
      (4L, "de", "x y z"))            // separate group         → pack 0
      .toDF("doc_id", "lang", "text")
    val out = Curation.packByTokenBudget(d, "lang", "doc_id", "text", budget = 10L)
      .select("doc_id", "n_tokens", "pack_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((5L, 0L)) && out(2L) == ((6L, 0L)),
      s"docs starting inside the first budget stay in pack 0: $out")
    assert(out(3L) == ((4L, 1L)), s"doc starting past the budget rolls over: $out")
    assert(out(4L) == ((3L, 0L)), "independent group restarts at pack 0")
    // pack ids are contiguous from 0 within each group
    val en = out.collect { case (id, (_, p)) if id <= 3 => p }.toSeq.sorted
    assert(en == Seq(0L, 0L, 1L))
  }

  test("pruneFrequentSegments: drops corpus-frequent lines, keeps order, empties fully-boilerplate docs") {
    val d = Seq(
      (1L, "cookie banner\nunique alpha\nall rights reserved"),
      (2L, "cookie banner\nunique beta\nall rights reserved"),
      (3L, "cookie banner\nunique gamma one\nunique gamma two\nall rights reserved"),
      (4L, "cookie banner\nall rights reserved")) // nothing survives
      .toDF("doc_id", "text")
    // maxDf = 3: "cookie banner" / "all rights reserved" appear in 4 docs → dropped
    val out = Curation.pruneFrequentSegments(d, "text", "doc_id", maxDf = 3L)
      .select("doc_id", "text_pruned", "n_kept").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("unique alpha", 1)), s"boilerplate must go: $out")
    assert(out(2L) == (("unique beta", 1)), s"boilerplate must go: $out")
    assert(out(3L) == (("unique gamma one\nunique gamma two", 2)),
      s"surviving segments keep their original order: $out")
    assert(out(4L) == (("", 0)), s"fully-boilerplate doc stays, empty: $out")
    // a column on the input passes through untouched
    val withExtra = Curation.pruneFrequentSegments(
      d.withColumn("lang", lit("en")), "text", "doc_id", maxDf = 3L)
    assert(withExtra.columns.toSet ==
      Set("doc_id", "text", "lang", "text_pruned", "n_kept"))
  }

  test("chunkByTokens: full coverage, overlap between neighbors, short final chunk") {
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "solo"))
      .toDF("doc_id", "text")
    val out = Curation.chunkByTokens(d, "text", "doc_id", chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // stride 3: starts at tokens 1,4,7,10
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._3).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"),
      s"windows must advance by chunkSize-overlap: ${doc1.toSeq}")
    assert(doc1.map(_._2).toSeq == Seq(0, 1, 2, 3), "chunk ids are 0-based ordinals")
    assert(doc1.map(_._4).toSeq == Seq(4, 4, 4, 1), "final chunk may be short")
    // every token appears in at least one chunk
    val covered = doc1.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet, "no token may be dropped")
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "solo", 1)),
      "short doc yields exactly one chunk")
    intercept[IllegalArgumentException] {
      Curation.chunkByTokens(d, "text", "doc_id", chunkSize = 4, overlap = 4)
    }
    // narrow at any scale: chunking introduces no shuffle
    val plan = Curation.chunkByTokens(d, "text", "doc_id", 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must stay shuffle-free:\n$plan")
  }

  test("repetitionScore: repeated phrase scores high, novel text low, short text zero") {
    val d = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"),
      (2L, "each of these words appears exactly once in this document"),
      (3L, "hi"))
      .toDF("doc_id", "text")
    val rep = Curation.repetitionScore(d, "text")
      .select("doc_id", "repetition").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rep(1L) > 0.7, s"repeated phrase should score high: ${rep(1L)}")
    assert(rep(2L) == 0.0, s"novel text should score zero: ${rep(2L)}")
    assert(rep(3L) == 0.0, s"unshingleable text scores zero: ${rep(3L)}")
    assert(rep.values.forall(v => v >= 0.0 && v < 1.0), s"score out of [0,1): $rep")
  }

  test("decontaminateStream matches the batch filter; null text passes through") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely different sentence about spark engines here"),
      (3L, "we mention the quick brown fox in passing today"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox ate")).toDF("doc_id", "text")
    val kept = Curation.decontaminateStream(corpus, "text", bench, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L),
      s"contaminated docs dropped, clean + null-text kept: $kept")
    // agrees with the batch anti-join variant on non-null rows
    val batchKept = Curation.decontaminate(
        corpus.filter(col("text").isNotNull), "text", "doc_id", bench, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept - 4L == batchKept, "stream and batch variants must agree")
  }

  test("decontaminateStreamBloom: only over-drops vs exact, false-drop rate < 1%") {
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val exact = Curation.decontaminateStream(docs, "text", bench, "text")
      .select("doc_id").as[Long].collect().toSet
    val bloom = Curation.decontaminateStreamBloom(docs, "text", bench, "text")
      .select("doc_id").as[Long].collect().toSet
    // Bloom false positives inflate overlap counts, so the sketch variant
    // may drop extra docs but must NEVER keep a doc the exact filter drops
    assert(bloom.subsetOf(exact),
      s"bloom kept docs the exact filter drops: ${(bloom -- exact).take(5)}")
    val falseDrops = exact.size - bloom.size
    assert(exact.isEmpty || falseDrops.toDouble / exact.size < 0.01,
      s"false-drop rate too high: $falseDrops of ${exact.size}")
  }

  test("tokenEntropy matches H = log2 n − (Σ c·log2 c)/n on known distributions") {
    val d = Seq(
      (1L, "a a a a"),          // one symbol → H = 0
      (2L, "a b c d"),          // uniform over 4 → H = 2
      (3L, "a a b b"),          // uniform over 2 → H = 1
      (4L, "a a b"),            // {2,1}: log2(3) − 2/3 ≈ 0.9183
      (5L, ""))                 // empty → 0 by definition
      .toDF("doc_id", "text")
    val h = Curation.tokenEntropy(d, "text")
      .select("doc_id", "entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(h(1L) - 0.0) < 1e-12, s"constant doc: ${h(1L)}")
    assert(math.abs(h(2L) - 2.0) < 1e-12, s"uniform-4 doc: ${h(2L)}")
    assert(math.abs(h(3L) - 1.0) < 1e-12, s"uniform-2 doc: ${h(3L)}")
    val expected4 = math.log(3.0) / math.log(2.0) - 2.0 / 3.0
    assert(math.abs(h(4L) - expected4) < 1e-12, s"2-1 doc: ${h(4L)}")
    assert(h(5L) == 0.0, s"empty doc: ${h(5L)}")
    // shuffle-free: the fold is a per-row projection at any corpus size
    val plan = Curation.tokenEntropy(d, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"entropy must stay narrow:\n$plan")
  }

  test("mixToWeights: binding stratum kept in full, proportions match weights") {
    val d = ((1 to 400).map(i => (i.toLong, "a")) ++
      (401 to 500).map(i => (i.toLong, "b")) ++
      (501 to 550).map(i => (i.toLong, "junk"))).toDF("doc_id", "strat")
    // ratios: a 400/0.5 = 800, b 100/0.5 = 200 → b binds, kept in full;
    // a sampled at 200·0.5/400 = 0.25 → ≈100; junk dropped entirely
    val out = Curation.mixToWeights(d, "doc_id", "strat",
      weights = Map("a" -> 0.5, "b" -> 0.5))
    val kept = out.groupBy("strat").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("junk"), s"unlisted strata must be dropped: $kept")
    assert(kept("b") == 100L, s"binding stratum must be kept in FULL: $kept")
    assert(math.abs(kept("a") - 100.0) / 100.0 < 0.25,
      s"stratum a should land near the 1:1 mixture: $kept")
    // deterministic + subset of input
    val again = Curation.mixToWeights(d, "doc_id", "strat",
      weights = Map("a" -> 0.5, "b" -> 0.5))
    assert(out.select("doc_id").except(again.select("doc_id")).isEmpty)
    assert(out.select("doc_id").except(d.select("doc_id")).isEmpty)
    // a stratum with zero rows in the data must not divide by zero
    val noB = Curation.mixToWeights(d.filter(col("strat") =!= "b"),
      "doc_id", "strat", weights = Map("a" -> 0.5, "b" -> 0.5))
    assert(noB.groupBy("strat").count().collect().map(_.getString(0)).toSet == Set("a"))
  }

  test("curriculumStages: monotone in score, boundary rows to the lower stage") {
    val d = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val staged = Curation.curriculumStages(d, "score", nStages = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // exact quartile cuts of 1..100 are 25.75/50.5/75.25 → 25/25/25/25
    val sizes = staged.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map(1 -> 25, 2 -> 25, 3 -> 25, 4 -> 25), s"got $sizes")
    // monotone: a higher score can never land in a lower stage
    val sorted = staged.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted, "stage must be monotone in score")
    // a row exactly ON a cut goes to the LOWER stage: 3 values, cuts at
    // interpolated quantiles of (1,2,3) = 1.5/2.0/2.5 → score 2.0 is on
    // the median cut and must stage as 2, not 3
    val tri = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "score")
    val t = Curation.curriculumStages(tri, "score", nStages = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(t(2L) == 2, s"boundary row must take the lower stage: $t")
    assert(t(1L) == 1 && t(3L) == 4, s"extremes must hit the end stages: $t")
  }

  test("balanceClasses: every class lands exactly at the minority count, deterministically") {
    val d = ((1 to 40).map(i => (i.toLong, "big")) ++
      (41 to 50).map(i => (i.toLong, "small")) ++
      (51 to 70).map(i => (i.toLong, "mid"))).toDF("id", "cls")
    val out = Curation.balanceClasses(d, "cls", "id")
    val counts = out.groupBy("cls").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 10L, "small" -> 10L, "mid" -> 10L), s"got $counts")
    // deterministic selection + subset of input
    val again = Curation.balanceClasses(d, "cls", "id")
    assert(out.select("id").except(again.select("id")).isEmpty)
    assert(out.select("id").except(d.select("id")).isEmpty)
    // two classes at 40 and 10 → 10 kept from each
    val bal = d.filter(col("id") <= 50)
    assert(Curation.balanceClasses(bal, "cls", "id").count() == 20L)
    // empty input: both ops must return empty, not NPE
    val empty = d.filter(col("id") < 0)
    assert(Curation.balanceClasses(empty, "cls", "id").count() == 0L)
    assert(Curation.curriculumStages(
      empty.withColumn("score", col("id").cast("double")), "score").count() == 0L)
  }

  test("bpeTrainMerges: greedy pair election, hierarchical second merge") {
    import spark.implicits._
    // "x y" dominates round 1 (4 occurrences); round 2's best pair is
    // the MERGED symbol x~y followed by z (3 occurrences) — pinning
    // that later rounds merge on top of earlier rounds' output
    val docs = Seq(
      (1L, "x y z x y z w"),
      (2L, "x y z x y q"),
      (3L, "a a a")) // overlapping pair: greedy counts 2, merges once
      .toDF("doc_id", "text")
    val m = Curation.bpeTrainMerges(docs, "text", steps = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(m(0) == ((1, "x", "y", 4L)), s"round 1: ${m.toSeq}")
    assert(m(1) == ((2, "x~y", "z", 3L)), s"round 2: ${m.toSeq}")
    // exhausted corpus: single-pair doc merges once, round 2 finds no
    // pairs — return the learned merge, don't crash on the empty argmax
    val tiny = Seq((1L, "a b")).toDF("doc_id", "text")
    val m2 = Curation.bpeTrainMerges(tiny, "text", steps = 3).collect()
    assert(m2.length == 1 && m2(0).getString(1) == "a")
  }

  test("gopherFlags: each rule rejects its own pathology, prose passes") {
    val prose = ("the cat and the dog have been friends with every " +
      "neighbour of that old house and they often sleep beside the " +
      "warm stove when winter comes to town and nights turn long " +
      "so the pair just rest there and wait for spring to come back " +
      "again with all the light")
    val d = Seq(
      (1L, prose),                                   // passes all rules
      (2L, "too short to pass the word count rule"), // < 50 words
      (3L, Seq.fill(60)("zq").mkString(" ")),        // mean len 2 < 3, no stopwords
      (4L, Seq.fill(60)("12345").mkString(" ")),     // no alphabetic words
      (5L, ""))                                      // empty: fails everything
      .toDF("doc_id", "text")
    val out = Curation.gopherFlags(d, "text")
      .select("doc_id", "pass", "ok_words", "ok_mean_len", "ok_alpha",
        "ok_stop")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5))).toMap
    assert(out(1L)._1, s"prose must pass: ${out(1L)}")
    assert(!out(2L)._2 && !out(2L)._1, "short doc fails word count")
    assert(!out(3L)._3 && !out(3L)._5, "short-token doc fails mean len + stop")
    assert(!out(4L)._4, "digit-only doc fails alpha fraction")
    assert(!out(5L)._1 && !out(5L)._2, "empty doc fails")
  }

  test("redactPii: per-type counts and ordered replacement on hand-built text") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail a@b.co and c.d@e-f.org twice"),          // 2 emails
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),       // 2 ipv4
      (3L, "call +1 555-010-1234 or 49 555-010-9999"),    // 2 phones
      (4L, "card 4111 1111 1111 1234 and 4111-1111-1111-0000"), // 2 cards
      // the ordering trap: the card must become [CARD], not be
      // partially eaten by the phone/ipv4 patterns
      (5L, "pay 4111 1111 1111 9999 at 10.0.0.1 via x@y.io"),
      (6L, "no pii here at all")
    ).toDF("doc_id", "text")
    val r = graft.ops.Curation.redactPii(d, "text")
      .select("doc_id", "n_card", "n_phone", "n_ipv4", "n_email", "red")
      .as[(Long, Long, Long, Long, Long, String)]
      .collect().map(t => t._1 -> t).toMap
    assert((r(1L)._2, r(1L)._3, r(1L)._4, r(1L)._5) == (0L, 0L, 0L, 2L))
    assert(r(1L)._6 == "mail [EMAIL] and [EMAIL] twice")
    assert(r(2L)._4 == 2L && r(2L)._6 == "server [IPV4] and [IPV4] up")
    assert(r(3L)._3 == 2L && r(3L)._6 == "call [PHONE] or [PHONE]")
    assert(r(4L)._2 == 2L && r(4L)._6 == "card [CARD] and [CARD]")
    assert((r(5L)._2, r(5L)._4, r(5L)._5) == (1L, 1L, 1L))
    assert(r(5L)._6 == "pay [CARD] at [IPV4] via [EMAIL]")
    assert(r(6L)._6 == "no pii here at all" &&
      (r(6L)._2 | r(6L)._3 | r(6L)._4 | r(6L)._5) == 0L)
  }

  // ---- graft_multi_count (Aho–Corasick blocklist kernel) --------------

  private def bruteCounts(text: String, pats: Seq[String]): Seq[Int] =
    pats.map { p =>
      var c = 0; var from = 0
      while ({ val i = text.indexOf(p, from); if (i >= 0) { c += 1; from = i + 1 }; i >= 0 }) ()
      c
    }

  private def acCounts(rows: Seq[String], pats: Seq[String]): Seq[Seq[Int]] = {
    import graft.functions.TextFunctions.multiPatternCounts
    rows.toDF("t")
      .select(multiPatternCounts(col("t"), pats).as("h"))
      .collect().map(r =>
        if (r.isNullAt(0)) null
        else r.getSeq[Int](0).toIndexedSeq).toIndexedSeq
  }

  test("multiPatternCounts: nested patterns, overlaps, and suffix-link outputs") {
    // "aa" self-overlaps; "ab" nests inside "aab" endings via fail links
    val pats = Seq("aa", "ab", "aab", "b")
    val texts = Seq("aaab", "abab", "aabaab", "bbbb", "")
    val got = acCounts(texts, pats)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == bruteCounts(t, pats),
        s"'$t': got ${got(i)}, want ${bruteCounts(t, pats)}")
    }
    // spot-check the interesting ones by hand
    assert(got(0) == Seq(2, 1, 1, 1), s"aaab: ${got(0)}") // aa@0, aa@1(overlap), ab@2, aab@1, b@3
    assert(got(2) == Seq(2, 2, 2, 2), s"aabaab: ${got(2)}")
  }

  test("multiPatternCounts: null text nulls, UTF-8 multi-byte patterns count bytewise-exactly") {
    import graft.functions.TextFunctions.multiPatternCounts
    val r = Seq[(java.lang.Long, String)]((1L, "café été café"), (2L, null))
      .toDF("id", "t")
      .select(col("id"), multiPatternCounts(col("t"), Seq("é", "café")).as("h"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) null else x.getSeq[Int](1).toIndexedSeq)).toMap
    assert(r(1L) == Seq(4, 2), s"accent counts: ${r(1L)}")
    assert(r(2L) == null, "null text must stay null")
  }

  test("multiPatternCounts: q_blocklist_match dictionary is border-free (oracle precondition)") {
    // the DuckDB oracle counts non-overlapping matches; equality with the
    // AC every-occurrence count requires each pattern to have no border
    graft.queries.LlmQueries.blocklistPats.foreach { p =>
      val borders = (1 until p.length).filter(k => p.take(k) == p.takeRight(k))
      assert(borders.isEmpty, s"pattern '$p' has border(s) $borders")
    }
  }

  test("multiPatternCounts: equals per-pattern brute scan on real corpus docs") {
    val pats = graft.queries.LlmQueries.blocklistPats
    val sample = docs.select("text").limit(50).collect().map(_.getString(0)).toSeq
    val got = acCounts(sample, pats)
    sample.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == bruteCounts(t, pats), s"doc $i diverged")
    }
  }

  test("AcAutomaton: CSR backend ≡ dense backend ≡ brute force; auto-switch on trie size") {
    import graft.functions.AcAutomaton
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7)
    val pats = (Seq("aa", "ab", "aab", "b", "aba", "é", "café") ++
      Seq.fill(60)((0 until (1 + rnd.nextInt(8)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)).distinct
    val bytes = pats.map(_.getBytes("UTF-8")).toArray
    val dense = new AcAutomaton(bytes, "dense")
    val csr = new AcAutomaton(bytes, "csr")
    assert(dense.isDense && !csr.isDense)
    val texts = Seq.fill(100)((0 until rnd.nextInt(80))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString) ++ Seq("", "café été")
    texts.foreach { t =>
      val u = UTF8String.fromString(t)
      val d = dense.counts(u).toIntArray.toSeq
      assert(d == csr.counts(u).toIntArray.toSeq, s"backend divergence on '$t'")
      assert(d == bruteCounts(t, pats), s"'$t' vs brute")
    }
    // small dictionary auto-selects dense; a trie past the 32K-node
    // budget auto-selects csr, still count-identical to forced dense
    assert(new AcAutomaton(bytes).isDense)
    val bigPats = (0 until 6000).map(i => f"term${rnd.nextInt(100000)}%05d_$i%04d")
      .distinct.toArray
    val big = new AcAutomaton(bigPats.map(_.getBytes("UTF-8")))
    assert(!big.isDense, s"expected csr for ${big.nNodes} nodes")
    val bigDense = new AcAutomaton(bigPats.map(_.getBytes("UTF-8")), "dense")
    val probe = UTF8String.fromString(
      bigPats.take(20).mkString(" ") + " " + bigPats.take(5).mkString(""))
    assert(big.counts(probe).toIntArray.toSeq ==
      bigDense.counts(probe).toIntArray.toSeq)
    // the point of the backend: ~two orders of magnitude less table memory
    assert(big.approxBytes * 20 < bigDense.approxBytes,
      s"csr ${big.approxBytes}B vs dense ${bigDense.approxBytes}B")
  }

  test("multiPatternHits ≡ nonzero entries of multiPatternCounts, both backends, NUL-literal dict") {
    import graft.functions.TextFunctions.{multiPatternCounts, multiPatternHits}
    val pats = Seq("aa", "ab", "aab", "b", "aba", "zqnevermatches")
    val texts = Seq("aaab", "abab", "aabaab", "bbbb", "", "ababab aba")
    for (backend <- Seq("dense", "csr")) {
      val rows = texts.toDF("t")
        .select(
          multiPatternCounts(col("t"), pats, backend).as("c"),
          multiPatternHits(col("t"), pats, backend).as("h"))
        .collect()
      rows.zip(texts).foreach { case (r, t) =>
        val dense = r.getSeq[Int](0)
        val sparse = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => x.getInt(0) -> x.getInt(1))
        val expect = dense.zipWithIndex.collect { case (c, i) if c > 0 => i -> c }
        assert(sparse == expect, s"'$t' [$backend]: $sparse vs $expect")
        // pat_id ascending, no zero counts
        assert(sparse.map(_._1) == sparse.map(_._1).sorted)
      }
    }
  }

  test("multiPatternCounts: randomized property vs brute force on a small alphabet") {
    val rnd = new scala.util.Random(42)
    val pats = Seq("a", "ab", "ba", "aba", "bb", "aab")
    val texts = Seq.fill(60)(
      (0 until (1 + rnd.nextInt(30))).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString)
    val got = acCounts(texts, pats)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == bruteCounts(t, pats),
        s"'$t': got ${got(i)}, want ${bruteCounts(t, pats)}")
    }
  }
}
