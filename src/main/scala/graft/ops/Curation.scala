package graft.ops

import graft.core.Transforms
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between dedup
  * and training: benchmark decontamination, deterministic train/test
  * splitting, and within-document repetition scoring (SURVEY.md §2.3
  * north-star rows, extended).
  */
object Curation {

  /** Per-document contamination counts against a benchmark corpus: how
    * many of the document's distinct word n-gram shingles also appear in
    * the benchmark (the standard n-gram-overlap decontamination test —
    * a training document sharing enough n-grams with an eval suite leaks
    * the benchmark).
    *
    * Scale shape: the benchmark side is an eval suite — megabytes by
    * nature, against terabytes of corpus — so its distinct shingle-hash
    * set is explicitly broadcast and the corpus side is a single narrow
    * kernel pass + explode + one aggregation by id; the corpus is never
    * shuffled by shingle. Shingles are compared as 64-bit hashes
    * ([[graft.functions.TokenShingleHashes]]): equality is all the
    * overlap count needs.
    *
    * Output: (id, n_contam) — documents with zero overlap included with
    * n_contam = 0 (left join back onto the corpus).
    */
  def contaminationCounts(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, shingleLen: Int = 3): DataFrame = {
    val benchSh = bench
      .select(explode(shingleHashes(col(benchTextCol), shingleLen)).as("s"))
      .distinct()
    val docSh = Transforms.fanOut(docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), explode(shingleHashes(col(textCol), shingleLen)).as("s"))
    val hits = docSh.join(broadcast(benchSh), Seq("s"))
      .groupBy("id").agg(count(lit(1)).as("n_contam"))
    docs.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_contam"), lit(0L)).as("n_contam"))
  }

  /** Drop every document sharing at least `minOverlap` shingles with the
    * benchmark — the decontamination filter itself. */
  /** Multi-type PII scrubbing — the pre-training privacy pass. Patterns
    * stay in the regex subset Java and RE2 share (no lookarounds, no
    * backrefs), so a DuckDB oracle runs the identical expressions.
    * Replacement order is most-specific first (a card is four
    * spaced/dashed quads; the phone pattern must not see it first). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "card" -> "\\b\\d{4}(?:[ -]\\d{4}){3}\\b",
    "phone" -> "\\+?\\d{1,2} \\d{3}-\\d{3}-\\d{4}",
    "ipv4" -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")

  /** Adds per-type match counts `n_card`/`n_phone`/`n_ipv4`/`n_email`
    * (counted on the ORIGINAL text, so counts are order-independent)
    * and `red`, the text with every match replaced by its `[TYPE]`
    * token, applied in [[piiPatterns]] order. One narrow codegen pass —
    * nothing shuffles. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val withCounts = piiPatterns.foldLeft(df) { case (d, (name, pat)) =>
      d.withColumn("n_" + name,
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    }
    withCounts.withColumn("red",
      piiPatterns.foldLeft(col(textCol)) { case (c, (name, pat)) =>
        regexp_replace(c, pat, "[" + name.toUpperCase + "]")
      })
  }

  def decontaminate(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, shingleLen: Int = 3,
      minOverlap: Int = 1): DataFrame = {
    val contaminated = contaminationCounts(
        docs, textCol, idCol, bench, benchTextCol, shingleLen)
      .filter(col("n_contam") >= minOverlap)
      .select(col("id").as(idCol))
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Per-benchmark-item leak report — [[contaminationCounts]] reversed:
    * for each eval/benchmark document, how many of its distinct shingles
    * occur anywhere in the corpus (`n_leaked` of `n_shingles`) and how
    * many corpus-document hits they have in total (`n_doc_hits`). This is
    * the question an eval owner asks ("which benchmark items are burned,
    * and how badly") where [[decontaminate]] answers the curator's
    * ("which training docs must go").
    *
    * Scale shape: identical to [[contaminationCounts]] — the corpus-side
    * shingle pass is filtered by a broadcast of the (tiny) benchmark
    * shingle set BEFORE any aggregation, so every shuffle is bounded by
    * the benchmark's shingle vocabulary, never the corpus. */
  def contaminationReport(docs: DataFrame, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      shingleLen: Int = 3): DataFrame = {
    val benchSh = bench.select(col(benchIdCol).as("bid"),
      explode(shingleHashes(col(benchTextCol), shingleLen)).as("s"))
    val hits = Transforms.fanOut(docs.select(col(textCol)))
      .select(explode(shingleHashes(col(textCol), shingleLen)).as("s"))
      .join(broadcast(benchSh.select("s").distinct()), Seq("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
    benchSh.join(hits, Seq("s"), "left")
      .groupBy("bid").agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df").isNotNull, 1L).otherwise(0L)).as("n_leaked"),
        coalesce(sum("df"), lit(0L)).as("n_doc_hits"))
  }

  /** Streaming-safe decontamination: the per-row formulation of
    * [[decontaminate]]. The benchmark's distinct shingle-hash set is
    * collected once (bounded by eval-suite size — megabytes by nature,
    * same contract as the broadcast in [[contaminationCounts]]) and
    * broadcast; each document is then a pure per-row filter — no explode,
    * no shuffle, no aggregation — so it composes into an append-mode
    * streaming pipeline where the batch operator's groupBy + anti-join
    * cannot. The set-membership probe is the one place a UDF is justified:
    * no built-in tests array elements against a driver-built set. At
    * larger bench sizes swap the Set for
    * `org.apache.spark.util.sketch.BloomFilter` (public Spark API) inside
    * the same broadcast — identical plumbing, sub-1% false-drop. */
  def decontaminateStream(docs: DataFrame, textCol: String,
      bench: DataFrame, benchTextCol: String, shingleLen: Int = 3,
      minOverlap: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    val hashes = bench
      .select(explode(shingleHashes(col(benchTextCol), shingleLen)).as("s"))
      .distinct().collect().map(_.getLong(0)).toSet
    val bc = spark.sparkContext.broadcast(hashes)
    val overlap = udf { sh: Seq[Long] =>
      if (sh == null) 0
      else { var n = 0; sh.foreach(h => if (bc.value.contains(h)) n += 1); n }
    }
    docs.filter(overlap(shingleHashes(col(textCol), shingleLen)) < minOverlap)
  }

  /** [[decontaminateStream]] with the exact driver Set swapped for
    * `org.apache.spark.util.sketch.BloomFilter` — the scale path the
    * exact variant's doc promises. The filter is built DISTRIBUTIVELY by
    * `DataFrame.stat.bloomFilter` (executor-side partial filters, bitwise
    * OR-merged on the driver), so driver memory is the fpp-sized bit
    * array, never the benchmark's raw shingle set: a 10⁹-shingle
    * benchmark suite at fpp=0.1% is ~1.7 GB of bits instead of 8+ GB of
    * boxed Longs in a Set. Probe side is the identical per-row narrow
    * filter (no explode, no shuffle) — streaming-safe.
    *
    * Error direction is the safe one: Bloom false positives only inflate
    * a document's apparent overlap, so the variant can only OVER-drop
    * relative to [[decontaminateStream]] (never leak a contaminated doc).
    *
    * fpp compounds PER PROBE: a doc with s shingles survives all probes
    * with probability (1−fpp)^s, so the per-DOC false-drop rate at
    * minOverlap=1 is ≈ s·fpp. Defaults target real document sizes
    * (s ~ 10²–10³): fpp=1e-6 keeps false drops under 0.1% at s=1000
    * for ~28.8 bits/item — still ~20× smaller than boxed Longs in a Set.
    * CurationSpec pins the subset property and the <1% false-drop bound.
    *
    * @param expectedItems sizing hint for the filter; ≤0 ⇒ one bounded
    *   count of the benchmark's distinct shingles (eval suites are small
    *   by nature; at most one extra job over the tiny side). */
  def decontaminateStreamBloom(docs: DataFrame, textCol: String,
      bench: DataFrame, benchTextCol: String, shingleLen: Int = 3,
      minOverlap: Int = 1, expectedItems: Long = 0L,
      fpp: Double = 1e-6): DataFrame = {
    val spark = docs.sparkSession
    val sh = bench
      .select(explode(shingleHashes(col(benchTextCol), shingleLen)).as("s"))
      .distinct()
    val items = if (expectedItems > 0) expectedItems
      else math.max(1L, sh.count())
    val bf = sh.stat.bloomFilter("s", items, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val overlap = udf { xs: Seq[Long] =>
      if (xs == null) 0
      else { var n = 0; xs.foreach(h => if (bc.value.mightContainLong(h)) n += 1); n }
    }
    docs.filter(overlap(shingleHashes(col(textCol), shingleLen)) < minOverlap)
  }

  /** Deterministic hash split: assign each row to "train" or "test" from
    * the md5 of its id — stable across runs, engines, and cluster
    * topology (no RNG, no row order dependence), so the same document
    * always lands in the same split. The first 4 hex chars of the md5 are
    * uniform, so a lexicographic threshold at trainFrac·16⁴ gives the
    * requested fraction within ~2⁻¹⁶. Purely narrow — the split of a
    * 100 TB corpus costs one projection. */
  def hashSplit(df: DataFrame, idCol: String, trainFrac: Double = 0.8,
      splitCol: String = "split"): DataFrame = {
    require(trainFrac > 0.0 && trainFrac < 1.0,
      s"trainFrac must be in (0,1), got $trainFrac")
    df.withColumn(splitCol,
      when(substring(md5(col(idCol).cast("string")), 1, 4) < hexThreshold(trainFrac),
        "train").otherwise("test"))
  }

  /** 4-hex-char md5-prefix threshold for fraction `f`. Capped at 0xffff so
    * rounding can never produce the 5-char "10000" (which, compared
    * lexicographically against 4-char digests, would keep only ~6% of
    * rows); f ≥ 1.0 maps to "g", which every hex digest sorts below, so
    * the filter keeps all rows exactly. */
  private def hexThreshold(f: Double): String =
    if (f >= 1.0) "g"
    else f"${math.min(math.round(f * 65536).toInt, 65535)}%04x"

  /** Deterministic stratified sampling: keep each stratum at its own
    * rate, decided by the md5 of the row id (same row → same verdict on
    * any engine, run, or topology — reproducible corpus subsets, unlike
    * RNG sampling whose outcome depends on partition layout). Strata
    * missing from `fractions` keep `defaultFrac`. One narrow projection +
    * filter at any scale; rates are honored within ~2⁻¹⁶ per stratum
    * (4-hex-digit threshold). */
  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFrac: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFrac)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    val cutoff = fractions.foldLeft(lit(hexThreshold(defaultFrac))) {
      case (acc, (k, f)) =>
        when(col(strataCol) === k, lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(substring(md5(col(idCol).cast("string")), 1, 4) < cutoff)
  }

  /** Token-budget packing (the concat-and-chunk shape LLM training
    * pipelines use): order documents deterministically within each group,
    * lay them out on a contiguous token tape, and assign each document to
    * the chunk containing its START offset — `pack_id = floor(
    * (running − own) / budget)`. Window cumulative sum: one shuffle+sort
    * per group, no driver state, and (unlike true greedy bin packing,
    * which is inherently sequential) identical on any engine — the DuckDB
    * twin is the same window expression. Adds `n_tokens` and `pack_id`. */
  def packByTokenBudget(df: DataFrame, groupCol: String, orderCol: String,
      textCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
      .withColumn("pack_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(budget)))
  }

  /** Corpus-level boilerplate-segment removal (the C4-style cleanup):
    * split every document into segments on `delim` (lines by default),
    * count each distinct segment's document frequency across the whole
    * corpus, drop segments appearing in MORE than `maxDf` documents
    * (navigation bars, cookie banners, license headers — anything
    * repeated verbatim across the corpus), and reassemble each
    * document's surviving segments in their original order.
    *
    * Scale shape: the *hot* segment set is what gets joined, not the
    * full vocabulary — by construction it holds at most
    * |corpus segments| / maxDf entries (a segment needs > maxDf distinct
    * documents to qualify), so the pruning join is a left-anti against a
    * small relation that AQE turns into a broadcast when it fits; the
    * corpus side is never shuffled by segment for the join itself. The
    * df aggregate is the one segment-keyed shuffle, with map-side
    * partial aggregation. Reassembly groups by document id —
    * segments of one document fit in one task by the same assumption
    * every per-document operator here makes.
    *
    * Adds `outCol` (pruned text, original segment order, `delim`-joined,
    * "" when everything was boilerplate) and `n_kept` (surviving segment
    * count). All input columns pass through.
    */
  def pruneFrequentSegments(df: DataFrame, textCol: String, idCol: String,
      maxDf: Long, delim: String = "\n",
      outCol: String = "text_pruned"): DataFrame = {
    require(maxDf > 0, s"maxDf must be positive, got $maxDf")
    val segs = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
        .as(Seq("_pos", "_seg")))
    val hot = segs.groupBy("_seg")
      .agg(count_distinct(col(idCol)).as("_df"))
      .filter(col("_df") > maxDf)
      .select("_seg")
    val rebuilt = segs.join(hot, Seq("_seg"), "left_anti")
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("_pos"), col("_seg"))))
        .as("_ps"))
      .select(col(idCol),
        concat_ws(delim, transform(col("_ps"), p => p("_seg"))).as(outCol),
        size(col("_ps")).as("n_kept"))
    df.join(rebuilt, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol), lit("")))
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0)))
  }

  /** Fixed-size token-window chunking with overlap — the context-window
    * packing step before embedding or training: split `textCol` on
    * `delim` (single literal space by default), emit one row per window
    * of `chunkSize` tokens advancing by `chunkSize − overlap`, so
    * consecutive chunks share `overlap` tokens and every token is
    * covered. The final chunk may be shorter. Purely narrow — a
    * per-row explode, no shuffle at any scale.
    *
    * Output: (`idCol`, `chunk_id` 0-based, `chunk_text`, `n_tokens`).
    */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, overlap: Int = 0, delim: String = " "): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    Transforms.materialized(
        df.select(col(idCol), col(textCol)), "_t",
        split(col(textCol), java.util.regex.Pattern.quote(delim)))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), greatest(size(col("_t")) - 1, lit(0)), lit(stride)),
          s => slice(col("_t"), s + 1, lit(chunkSize))))
          .as(Seq("chunk_id", "_chunk")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(delim, col("_chunk")).as("chunk_text"),
        size(col("_chunk")).as("n_tokens"))
  }

  /** Per-document unigram token entropy in bits — the classic
    * text-quality / diversity signal (word salad and boilerplate both
    * score low; H = 0 for a one-token vocabulary). Uses the identity
    * H = log₂n − (Σ c·log₂c)/n over per-token counts c, with the counts
    * taken as run lengths of the SORTED token array — a pure per-row
    * higher-order-function pass, so the whole corpus is scored with ZERO
    * shuffle (the explode+groupBy formulation would shuffle every token).
    * Adds `entropy` (0.0 for empty documents). */
  def tokenEntropy(df: DataFrame, textCol: String): DataFrame = {
    val base = Transforms.materialized(df, "_srt",
      array_sort(tokens(col(textCol))))
    // Σ c·log₂c accumulated over runs: state = (previous token, current
    // run length, sum over closed runs). The sentinel can't collide —
    // tokenization never yields a NUL token.
    def cLog2(c: Column): Column =
      when(c > 1L, c.cast("double") * log2(c.cast("double"))).otherwise(lit(0.0))
    val stateZero = struct(lit("\u0000").as("prev"), lit(0L).as("run"),
      lit(0.0).as("acc"))
    val folded = aggregate(
      col("_srt"), stateZero,
      (st, t) => when(t === st.getField("prev"),
          struct(t.as("prev"), (st.getField("run") + 1L).as("run"),
            st.getField("acc").as("acc")))
        .otherwise(
          struct(t.as("prev"), lit(1L).as("run"),
            (st.getField("acc") + cLog2(st.getField("run"))).as("acc"))),
      st => st.getField("acc") + cLog2(st.getField("run")))
    val n = size(col("_srt")).cast("double")
    base.withColumn("entropy",
        when(n <= 0.0, lit(0.0)).otherwise(log2(n) - folded / n))
      .drop("_srt")
  }

  /** Sample a corpus down to target mixture `weights` over `strataCol`
    * with maximum retention: the binding stratum (smallest count/weight
    * ratio) is kept in full and every other stratum is down-sampled so
    * the output proportions match the weights. Strata not in `weights`
    * are dropped. Sampling is the deterministic md5-threshold of
    * [[sampleStratified]], so the mix is reproducible on any engine or
    * topology.
    *
    * The per-stratum counts are collected to the driver — |weights| rows,
    * bounded by the mixture spec the caller wrote, never by corpus size.
    * Proportions are honored within the 2⁻¹⁶ threshold quantization. */
  def mixToWeights(df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      "weights must be positive")
    val inMix = df.filter(col(strataCol).isin(weights.keys.toSeq: _*))
    val counts = inMix.groupBy(strataCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val present = weights.filter { case (k, _) => counts.getOrElse(k, 0L) > 0L }
    if (present.isEmpty) inMix.limit(0)
    else {
      // largest total size every stratum can still supply its share of;
      // the binding stratum gets fraction exactly 1.0 (not a float
      // round-trip of the same ratio, which can land at 0.999…)
      val binding = present.minBy { case (k, w) => (counts(k) / w, k) }._1
      val scale = counts(binding) / present(binding)
      val fractions = present.map { case (k, w) =>
        k -> (if (k == binding) 1.0
              else math.min(1.0, scale * w / counts(k))) }
      sampleStratified(inMix, idCol, strataCol, fractions, defaultFrac = 0.0)
    }
  }

  /** Within-document repetition ratio: 1 − |distinct shingles| /
    * |positional shingles| — 0 for fully novel text, → 1 for a document
    * that repeats one phrase (boilerplate, keyword stuffing, decoding
    * loops). Computed per row from the one-pass shingle kernel (narrow;
    * both counts from one array). Documents too short to shingle score
    * 0.0 (nothing repeats). Adds `repetition`. */
  def repetitionScore(df: DataFrame, textCol: String,
      shingleLen: Int = 3): DataFrame =
    Transforms.materialized(df, "_shp", shinglesN(col(textCol), shingleLen))
      .withColumn("repetition",
        when(size(col("_shp")) === 0, lit(0.0))
          .otherwise(lit(1.0) -
            size(array_distinct(col("_shp"))).cast("double") /
              size(col("_shp")).cast("double")))
      .drop("_shp")

  /** Curriculum staging: split the corpus into `nStages` difficulty
    * stages by quantile cut points of `scoreCol` (easy → hard is the
    * standard curriculum-learning schedule). Adds `stage` ∈ [1, nStages]:
    * stage = 1 + |{cuts below score}| — a row on a cut boundary goes to
    * the LOWER stage, so the assignment is a pure threshold comparison,
    * not a global rank. The cut points are one exact-`percentile`
    * aggregation (nStages−1 doubles on the driver, bounded by the stage
    * count); the assignment pass is narrow. At 100 TB swap the exact
    * percentile for `percentile_approx` — the assignment pass and
    * everything downstream are unchanged (same dial as
    * q_approx_quantile's sketch-vs-exact pairing). */
  def curriculumStages(df: DataFrame, scoreCol: String,
      nStages: Int = 4): DataFrame = {
    require(nStages >= 2, "nStages must be >= 2")
    val qs = (1 until nStages).map(i => s"${i.toDouble / nStages}D")
    val row = df
      .agg(expr(s"percentile($scoreCol, array(${qs.mkString(", ")}))"))
      .first()
    // empty input (or all-null scores): no cut points exist — emit the
    // schema with every (zero) row in stage 1 instead of an NPE
    val cuts = if (row.isNullAt(0)) Seq.empty[Double] else row.getSeq[Double](0)
    df.withColumn("stage", cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(col(scoreCol) > c, 1).otherwise(0) })
  }

  /** Class rebalancing by deterministic undersampling: keep exactly
    * `min(class count)` rows of every class, selected by md5 rank within
    * the class (the engine-portable coin of [[sampleStratified]]), so the
    * balanced subset is reproducible on any topology. The minority count
    * is one scalar to the driver; the quota filter is a rank-≤-N window
    * Spark executes as a map-side-pruned WindowGroupLimit — no class is
    * ever fully sorted. */
  def balanceClasses(df: DataFrame, labelCol: String,
      idCol: String): DataFrame = {
    val row = df.groupBy(labelCol).agg(count(lit(1)).as("_n"))
      .agg(min("_n")).first()
    // empty input: min over zero groups is NULL — short-circuit to the
    // (empty) input instead of an NPE
    if (row.isNullAt(0)) return df
    val minN = row.getLong(0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(labelCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= minN).drop("_rk")
  }

  /** BPE merge-rule training (Sennrich et al. 2016), distributed: each
    * round counts adjacent symbol pairs across the whole corpus (one
    * vocabulary-bounded shuffle), takes the most frequent pair
    * (deterministic (count desc, pair asc) tie-break — ONE row to the
    * driver, like kmeans' centroids), and rewrites every document with
    * that pair merged. Returns the learned merge table
    * (step, sym_a, sym_b, pair_n).
    *
    * Corpus representation is a DOUBLE-space-joined symbol string with
    * double-space sentinels: the merge rewrite is then a plain literal
    * `replace(s, ' a  b ', ' a~b ')` — each adjacent-pair occurrence
    * owns one private space on each side, so left-to-right
    * non-overlapping string replace applies exactly the greedy
    * token-space merge, identically on any engine (this is what makes
    * the unrolled SQL oracle bit-exact).
    *
    * Scale: each round is one narrow rewrite + one pair-count shuffle;
    * per-round `localCheckpoint` caps the iterative lineage. Real
    * tokenizers train tens of thousands of merges — production runs
    * this on a sampled subcorpus (merge ranks stabilize quickly), then
    * APPLIES the rules corpus-wide; the per-round cost model is the
    * same either way.
    */
  def bpeTrainMerges(docs: DataFrame, textCol: String,
      steps: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = docs.select(
      concat(lit("  "), array_join(tokens(col(textCol)), "  "), lit("  "))
        .as("s"))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to steps) {
      val t = filter(split(col("s"), "  "), x => x =!= "")
      val prs = cur.select(t.as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy("p.a", "p.b").agg(count(lit(1)).as("n"))
      val tops = prs.orderBy(desc("n"), asc("a"), asc("b")).limit(1)
        .collect()
      // corpus exhausted (every doc below 2 symbols): return the
      // merges learned so far instead of indexing an empty result
      if (tops.isEmpty)
        return merges.result().toDF("step", "sym_a", "sym_b", "pair_n")
      val top = tops(0)
      val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
      require((a + b).matches("[A-Za-z0-9~]+"),
        s"symbol escaping not needed for this corpus, got '$a','$b'")
      merges += ((step, a, b, n))
      cur = cur.withColumn("s",
          expr(s"replace(s, ' $a  $b ', ' $a~$b ')"))
        .localCheckpoint()
    }
    merges.result().toDF("step", "sym_a", "sym_b", "pair_n")
  }

  /** Apply learned BPE merge rules in training order: the tokenize-side
    * complement of [[bpeTrainMerges]] — a purely narrow chain of
    * `steps` literal replaces over the double-space representation (no
    * shuffle, no state; the rules ride the closure as literals exactly
    * like a production tokenizer ships its merges file). Returns the
    * input plus `bpe_n` (post-merge symbol count). */
  def bpeApply(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val start = concat(lit("  "), array_join(tokens(col(textCol)), "  "),
      lit("  "))
    val rewritten = merges.foldLeft(start) { case (c, (a, b)) =>
      require((a + b).matches("[A-Za-z0-9~]+"), s"unescapable symbol: $a $b")
      // expr() needs a named column; build with the SQL function directly
      call_function("replace", c, lit(s" $a  $b "), lit(s" $a~$b "))
    }
    docs.withColumn("bpe_n",
      size(filter(split(rewritten, "  "), x => x =!= "")))
  }

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1, the
    * filter set RefinedWeb/Dolma inherit): per-document word count
    * bounds, mean word length bounds, minimum alphabetic-word fraction,
    * and a minimum stop-word hit count (the "is this prose at all"
    * test). Emits the raw measurements plus a per-rule flag and the
    * conjunctive `pass` — downstream either filters on `pass` or audits
    * per-rule rejection rates.
    *
    * Scale shape: every rule is a per-row higher-order-function fold
    * over the token array — no UDF, no shuffle, fully codegen'd; the
    * corpus streams through in one narrow pass. Thresholds are
    * parameters because every corpus tunes them; defaults are Gopher's
    * (word count 50..100k, mean word length 3..10, ≥80% alphabetic
    * words, ≥2 distinct stop words).
    */
  def gopherFlags(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopHits: Int = 2,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"))
      : DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val n = size(toks)
    val safeN = greatest(n, lit(1)).cast("double")
    val meanLen = aggregate(toks, lit(0L),
      (acc, x) => acc + length(x)).cast("double") / safeN
    val alphaFrac =
      size(filter(toks, x => x.rlike("[a-z]"))).cast("double") / safeN
    val stopHits = size(array_intersect(
      array_distinct(toks), array(stopwords.map(lit): _*)))
    df.withColumn("n_words", n)
      .withColumn("mean_word_len", meanLen)
      .withColumn("alpha_frac", alphaFrac)
      .withColumn("stop_hits", stopHits)
      .withColumn("ok_words", n.between(minWords, maxWords))
      .withColumn("ok_mean_len", meanLen.between(minMeanLen, maxMeanLen))
      .withColumn("ok_alpha", alphaFrac >= minAlphaFrac)
      .withColumn("ok_stop", stopHits >= minStopHits)
      .withColumn("pass", col("ok_words") && col("ok_mean_len") &&
        col("ok_alpha") && col("ok_stop"))
  }
}
