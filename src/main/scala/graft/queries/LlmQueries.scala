package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.ops.{Codecs, Curation, Dedup, Multimodal, Similarity, TfIdf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (SURVEY.md §2.3 north-star rows):
  * text analysis, fingerprinting, near-dedup, embedding similarity.
  *
  * Queries with DuckDB-expressible semantics are in [[oracle]]; the
  * hash-based ones (MinHash/SimHash/LSH — Spark's xxhash64 has no DuckDB
  * twin) are registered without oracle SQL, so the driver records the
  * weaker rows-only check; their semantics are instead tested in
  * `src/test/scala/graft/DedupSpec.scala` against exact-Jaccard recall.
  */
object LlmQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Fan a small scan out to the session's parallelism BEFORE a
    * CPU-heavy per-row codec/synthesis pass (r18 optimization, guide
    * §2.5 input parallelism): the bench corpora are single-row-group
    * parquet files, so without this every decode/fingerprint UDF pass
    * runs in ONE scan task however many cores the session has.
    * [[graft.core.Transforms.fanOut]] is a no-op when the scan already
    * has enough splits, so at real scale no shuffle is introduced —
    * and it is applied BELOW the payload-synthesis projection, so only
    * the tiny id/text columns ever cross the exchange. */
  private def fanned(df: DataFrame): DataFrame =
    graft.core.Transforms.fanOut(df)

  // q_blocklist_match's term dictionary: all patterns border-free (no
  // proper prefix that is also a suffix), so every-occurrence AC counts
  // equal non-overlapping replace counts — the oracle relies on it.
  private[graft] val blocklistPats = Seq("big table", "dup", "fast scan",
    "scan", "slow merge", "slow query", "small batch", "sort merge")

  /** q_blocklist_hits dictionary: the 8 matching phrases plus 40
    * deterministic inert terms — "zq" + 6 letters from [a-p], so no term
    * contains a second 'z'/'q' and every junk term is provably
    * border-free (the oracle's replace-count twin needs that), and none
    * can occur in the ~31-word corpus vocabulary. */
  private[graft] val blocklistHitsDict: Seq[String] = (blocklistPats ++ {
    val rnd = new scala.util.Random(99)
    Seq.fill(40)("zq" + (0 until 6).map(_ => ('a' + rnd.nextInt(16)).toChar).mkString)
  }).distinct

  /** q_sim_ivfpq_refine's corpus: a CLUSTERED embedding table derived
    * deterministically from `embeddings` — per-label integer-lattice
    * centers, center(label)[i] = ((37·label + 17·i) mod 13) − 6, plus
    * the raw embedding as noise. Labels are distinct mod 13 so any two
    * centers differ by a nonzero lattice shift in nearly every
    * coordinate (unit-plus separation) while the noise is σ≈0.13/coord
    * — tight, well-separated clusters, the geometry real embedding
    * corpora have and space-partitioning indexes exploit
    * (StructuredEmbeddingsSpec's mixture-of-Gaussians, but exactly
    * replayable in DuckDB: the lattice arithmetic is integer-exact and
    * center + x is a single IEEE add on both engines). */
  private def clusteredEmbeddings(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      transform(col("embedding"), (x, i) =>
        ((col("label") * 37 + i * 17) % 13 - 6).cast("double")
          + x.cast("double")).as("embedding"),
      col("label"))

  /** Build-once state for q_sim_ivfpq_serve (r14, verdict item 3): the
    * serving-deployment shape, where the residual-PQ index + codebooks
    * exist BEFORE the first query arrives. Keyed by (session, sf dir);
    * holds the bucketed code-table name, the trained codebooks/coarse
    * centroids (bounded driver state — m·k·subdim + k·dim doubles), and
    * the checkpointed clustered corpus the refine stage re-ranks
    * against. The composite that PAYS the training cost every run stays
    * registered as q_sim_ivfpq_refine; this cache is what turns the
    * serve query into probe+refine only. */
  private type ServedIdx =
    (String, Array[Array[Seq[Double]]], Array[Seq[Double]], DataFrame)
  // Bounded LRU (2 entries — a warmup SF + the active SF): each entry
  // pins a localCheckpoint'd corpus in block-manager memory, so a sweep
  // over many sf dirs must not accumulate them; an evicted entry's
  // checkpoint blocks are freed by the ContextCleaner once unreferenced
  // (the bucketed code TABLE is disk-resident and stays).
  private val servedRefineIdx =
    new java.util.LinkedHashMap[String, ServedIdx](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, ServedIdx]): Boolean = size() > 2
    }
  private def servedRefineIndex(s: SparkSession, d: String): ServedIdx =
    servedRefineIdx.synchronized {
      val key = s.sparkContext.applicationId + "|" + d
      val hit = servedRefineIdx.get(key)
      if (hit != null) hit
      else {
        val e = clusteredEmbeddings(s, d).localCheckpoint()
        val coarse = Similarity.kmeansFit(e, "vec_id", "embedding",
          k = 10, iters = 3, cosine = false)
        val tbl = ("graft_ivfpqserve_idx_" + s.sparkContext.applicationId +
          "_" + d).replaceAll("[^A-Za-z0-9_]", "_")
        val cb = Similarity.ivfPqResidualIndexBuild(e, "vec_id", "embedding",
          coarse, m = 16, k = 32, iters = 3, tableName = tbl, tableBuckets = 8)
        val v = (tbl, cb, coarse, e)
        servedRefineIdx.put(key, v)
        v
      }
    }

  /** Shared report tail of q_sim_ivfpq_refine and q_sim_ivfpq_serve:
    * exact L2 top-5 baseline (self-pairs kept — the probe keeps them),
    * macro recall@5 of `refined` against it, and the final
    * (q_id, rnk, n_id, dist, recall_ok ≥ 0.8) shape. ONE implementation
    * so the two queries cannot drift from their shared oracle. */
  private def refineRecallReport(queries: DataFrame, refined: DataFrame,
      e: DataFrame): DataFrame = {
    val qv = queries.select(col("vec_id").as("q_id"), col("embedding").as("_qv"))
    val wx = Window.partitionBy("q_id").orderBy(col("_d").asc, col("n_id"))
    val exact = broadcast(qv)
      .crossJoin(e.select(col("vec_id").as("n_id"), col("embedding").as("_nv")))
      .withColumn("_d", l2sqN(col("_qv"), col("_nv")))
      .withColumn("_rnk", row_number().over(wx))
      .filter(col("_rnk") <= 5)
      .select(col("q_id"), col("n_id"), lit(1).as("_hit"))
    val recall = refined.select("q_id", "n_id")
      .join(exact, Seq("q_id", "n_id"), "left")
      .groupBy("q_id")
      .agg((sum(coalesce(col("_hit"), lit(0))) / 5.0).as("_r"))
      .agg(avg("_r").as("_recall"))
    refined.crossJoin(broadcast(recall))
      .select(col("q_id"), col("rnk"), col("n_id"),
        round(col("dist"), 4).as("dist"),
        (col("_recall") >= 0.8).as("recall_ok"))
  }

  /** The fuzzy-link family's dirty derivation — ONE implementation
    * shared by q_fuzzy_link2, q_fuzzy_link_serve, and the serve index's
    * probe exemplar (the three must agree or the serve query drifts
    * from its shared oracle and the index tunes against the wrong
    * traffic): each record carries a deletion at position 10+key%9 plus
    * an 'x' substitution at position 3+key%5. Output: (src_key, d_s). */
  private def dirtyCustomers(cust: DataFrame): DataFrame = {
    val p = (lit(10) + col("c_custkey") % 9).cast("int")
    val del = concat(substr(col("c_name"), lit(1), p - 1),
      substr(col("c_name"), p + 1, lit(18) - p))
    val q = (lit(3) + col("c_custkey") % 5).cast("int")
    cust.filter(col("c_custkey") % 7 === 3)
      .select(col("c_custkey").as("src_key"),
        concat(substr(del, lit(1), q - 1), lit("x"),
          substr(del, q + 1, length(del) - q)).as("d_s"))
  }

  /** Shared report tail of the fuzzy-link family: per-dirty-record link
    * counts (m) and true-link hits (t), rolled up to the
    * (n_dirty, n_linked, n_ambiguous, n_pairs, n_true) summary. `dirty`
    * must carry `src_key`; `pairs` is any editJoin-shaped
    * (d_id, c_id, …) output. */
  private def fuzzyLinkReport(dirty: DataFrame, pairs: DataFrame): DataFrame = {
    val per = pairs.groupBy("d_id")
      .agg(count(lit(1)).as("m"),
        sum(when(col("c_id") === col("d_id"), 1L).otherwise(0L)).as("t"))
    dirty.join(per, dirty("src_key") === per("d_id"), "left")
      .agg(count(lit(1)).as("n_dirty"),
        count(col("d_id")).as("n_linked"),
        sum(when(col("m") > 1, 1L).otherwise(0L)).as("n_ambiguous"),
        coalesce(sum("m"), lit(0L)).as("n_pairs"),
        coalesce(sum("t"), lit(0L)).as("n_true"))
  }

  /** Build-once state for q_fuzzy_link_serve: the entity-resolution
    * catalog index ([[graft.ops.Linkage.editIndexBuild]] — bucketed
    * segment-hash table; the boundary map and τ persist WITH the index
    * in its `_meta` side table, r14 ADVICE) per (session, sf dir).
    * Unlike [[servedRefineIdx]] nothing heavy is pinned (the table is
    * disk-resident), so a plain memo of the table name suffices. */
  private val servedEditIdx =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def servedEditIndex(s: SparkSession, d: String): String =
    servedEditIdx.computeIfAbsent(s.sparkContext.applicationId + "|" + d, _ => {
      val tbl = ("graft_editserve_idx_" + s.sparkContext.applicationId +
        "_" + d).replaceAll("[^A-Za-z0-9_]", "_")
      val cust = Tables.customer(s, d)
      // probe exemplar = the dirty traffic this index serves (the
      // q_fuzzy_link2 derivation — "yesterday's batch"); without it the
      // catalog-self proxy admits ~9× the candidates (Linkage scaladoc)
      val exemplar = dirtyCustomers(cust)
      graft.ops.Linkage.editIndexBuild(cust,
        "c_custkey", "c_name", tau = 2, tableName = tbl, tableBuckets = 16,
        probeExemplar = Some((exemplar, "d_s")))
      tbl
    })

  // DuckDB twin of TextFunctions.tokens — keep in sync.
  private val sqlToks =
    "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
  private def sqlShingles(toks: String) =
    s"list_distinct(${sqlShinglesPos(toks)})"
  // positional trigram shingles (winnowing is order-sensitive; no distinct)
  private def sqlShinglesPos(toks: String) =
    s"list_transform(range(1, greatest(len($toks)-1, 1)), " +
      s"i -> concat_ws(' ', $toks[i], $toks[i+1], $toks[i+2]))"
  // DuckDB twin of TextFunctions.bpeishPattern (same RE2/Java-safe subset)
  private val sqlBpePat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  val queries: Map[String, Q] = Map(
    // ---- text analysis ----------------------------------------------
    "q_text_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars"),
          sum(tokenCount(col("text"))).as("n_tokens"))),

    // readability scoring (Flesch-shaped proxy): syllables approximated
    // as vowel-group runs — the standard trick when no dictionary is
    // shippable. documents.text has no sentence punctuation (TESTDATA
    // drift note), so the "sentence" term degenerates to per-doc and the
    // score reduces to word-count and vowel-density terms. Pure regex
    // counting, codegen'd, one groupBy(lang) shuffle of |langs| rows.
    "q_readability" -> ((s, d) => {
      val w = Tables.documents(s, d)
        .select(col("lang"),
          regexp_count(col("text"), lit("[A-Za-z]+")).cast("double")
            .as("words"),
          regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("double")
            .as("vg"))
        .filter(col("words") > 0)
      w.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(lit(206.835) - lit(1.015) * col("words")
            - lit(84.6) * (col("vg") / col("words"))), 2).as("avg_score"))
        .orderBy("lang")
    }),

    "q_text_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          count_distinct(col("tok")).as("n_distinct"),
          min("tok").as("first_tok"))),

    "q_text_quality" -> ((s, d) =>
      // materialized barrier: toks feeds two HOF features + a count —
      // without it the tokenize pipeline re-runs per use site
      graft.core.Transforms.materialized(
          Tables.documents(s, d), "toks", tokens(col("text")))
        .groupBy("lang")
        .agg(
          round(sum(stopwordRatio(col("toks"), Seq("the", "a", "of", "and"))), 2).as("sum_sw_ratio"),
          round(sum(meanTokenLen(col("toks"))), 2).as("sum_mean_len"),
          count(lit(1)).as("n"))),

    // two-pass unigram-LM quality score: corpus term frequencies, then
    // per-doc mean log-probability (gibberish scores low). No broadcast
    // hint on the frequency table: an unbounded vocabulary forced onto the
    // driver would OOM at corpus scale, and AQE already picks a broadcast
    // join at runtime whenever freq's actual size is under the threshold —
    // so we get the fast plan when it's safe and a shuffle join when not.
    // The single-row `total` aggregate is the one side that is provably
    // tiny, so that broadcast hint stays.
    "q_quality_lm" -> ((s, d) => {
      val t = graft.core.Transforms.materialized(
        Tables.documents(s, d).select("doc_id", "lang", "text"),
        "toks", tokens(col("text")))
      val tok = t.select(col("doc_id"), col("lang"), explode(col("toks")).as("t"))
      val freq = tok.groupBy("t").agg(count(lit(1)).as("c"))
      val total = tok.agg(count(lit(1)).cast("double").as("n"))
      val perDoc = tok.join(freq, "t").join(broadcast(total))
        .groupBy("doc_id", "lang")
        .agg((sum(log(col("c") / col("n"))) / count(lit(1))).as("lp"))
      perDoc.groupBy("lang")
        .agg(round(sum("lp"), 2).as("sum_lp"), count(lit(1)).as("n"))
    }),

    // bigram-LM perplexity scoring (the CCNet-style quality filter one
    // step up from q_quality_lm's unigrams): corpus bigram/prefix counts
    // with add-α smoothing → per-doc cross-entropy H = −mean log2
    // p(w2|w1) → per-lang aggregate. Scale shape: the exploded bigram
    // stream shuffles once by bigram key and once by prefix key (both
    // vocabulary-bounded; AQE broadcasts them when small), the
    // vocabulary size is a broadcast scalar, and the per-doc reduce is
    // keyed by doc_id — nothing is quadratic and the corpus is never
    // collected.
    "q_perplexity_bigram" -> ((s, d) => {
      val t = graft.core.Transforms.materialized(
        Tables.documents(s, d).select("doc_id", "lang", "text"),
        "toks", tokens(col("text")))
      val n = size(col("toks"))
      val pairs = when(n < 2, array().cast("array<struct<w1:string,bg:string>>"))
        .otherwise(zip_with(
          slice(col("toks"), lit(1), n - 1), slice(col("toks"), lit(2), n - 1),
          (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("bg"))))
      val b = t.select(col("doc_id"), col("lang"),
          explode(pairs).as("p"))
        .select(col("doc_id"), col("lang"),
          col("p.w1").as("w1"), col("p.bg").as("bg"))
      val c2 = b.groupBy("bg").agg(count(lit(1)).as("c2"))
      val c1 = b.groupBy("w1").agg(count(lit(1)).as("c1"))
      val vocab = t.select(explode(col("toks")).as("w"))
        .agg(count_distinct(col("w")).cast("double").as("v"))
      val perDoc = b.join(c2, "bg").join(c1, "w1").join(broadcast(vocab))
        .withColumn("lp",
          log2((col("c2") + 0.1) / (col("c1") + lit(0.1) * col("v"))))
        .groupBy("doc_id", "lang")
        .agg((lit(0) - sum("lp") / count(lit(1))).as("h"))
      perDoc.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(sum("h"), 2).as("sum_h"),
          round(max("h"), 2).as("max_h"))
        .orderBy("lang")
    }),

    // PII scrub mechanism: the corpus is synthetic word-salad with no
    // organic emails, so the query plants one deterministically per doc,
    // then detects + redacts — the regex/redact/verify plumbing is what
    // a curation pipeline runs at scale (narrow, no shuffle until agg).
    // The redacted text is materialized ONCE behind a Generate barrier
    // (otherwise CollapseProject inlines the regexp_replace at every use
    // site) and detection derives from it (txt <> red ⟺ an email matched,
    // since "[EMAIL]" can never match the pattern) — one regex pass per
    // row, not three.
    // split-leakage guard: near-duplicate documents (shared 12-token
    // prefix) straddling the id-hash train/test split — the split
    // hashes IDs, duplicates have different ids → they leak; the
    // canonical dedup-BEFORE-split lesson, measured. (Exact-fingerprint
    // leakage is the degenerate subset; this corpus's duplicates are
    // near-dups, so the prefix key is what actually catches them.)
    "q_split_leakage" -> ((s, d) => {
      import graft.functions.TextFunctions
      Curation.hashSplit(Tables.documents(s, d), "doc_id", trainFrac = 0.8)
        .select(md5(concat_ws(" ",
          slice(TextFunctions.tokens(col("text")), 1, 12))).as("fp"),
          col("split"))
        .groupBy("fp")
        .agg(count_distinct(col("split")).as("n_splits"),
          count(lit(1)).as("n_docs"))
        .filter(col("n_splits") > 1)
        .agg(count(lit(1)).as("leaked_groups"),
          sum("n_docs").cast("long").as("leaked_docs"))
    }),

    // multi-type PII scrubbing (card/phone/IPv4/email) — deterministic
    // synthetic PII appended per row (the corpus itself carries none);
    // counts from the pre-redaction text, ordered [TYPE] replacement
    "q_pii_multi" -> ((s, d) => {
      val did = col("doc_id")
      val txt = concat(col("text"),
        lit(" contact "), col("source"), lit("@example."), col("lang"),
        lit(" from 10.0."), (did % 256).cast("string"),
        lit("."), (did % 100).cast("string"),
        lit(" call +1 555-"), lpad((did % 1000).cast("string"), 3, "0"),
        lit("-"), lpad((did % 10000).cast("string"), 4, "0"),
        lit(" card 4111 1111 1111 "),
        lpad((did % 10000).cast("string"), 4, "0"))
      Curation.redactPii(
          Tables.documents(s, d).withColumn("txt", txt), "txt")
        .groupBy("lang")
        .agg(sum("n_card").as("cards"), sum("n_phone").as("phones"),
          sum("n_ipv4").as("ips"), sum("n_email").as("emails"),
          sum(length(col("red"))).as("redacted_len"),
          count_distinct(md5(col("red"))).as("n_distinct"))
    }),

    // entity resolution: link a typo'd record stream back to the clean
    // catalog with exact-recall prefix/suffix blocking (PassJoin τ=1) +
    // codegen levenshtein verify — two equi-joins, never a cross join.
    // Dirty side = every 7th customer with one deterministic digit
    // DELETED (position rotates with the key); each must re-link to its
    // source at distance 1 (n_true), and zero-padded keys make several
    // genuine distance-1 ambiguities (n_ambiguous > 0 — delete a zero
    // from Customer#000000123 and Customer#000001123 is one edit away
    // too). Split 16/2 because the entropy of id-like strings lives in
    // the tail: the tail-2 block key prunes ~100x vs the naive cross
    // join at sf0.1 (LinkageSpec pins recall == naive).
    "q_fuzzy_link" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val p = (lit(10) + col("c_custkey") % 9).cast("int")
      val dirty = cust.filter(col("c_custkey") % 7 === 3)
        .select(col("c_custkey").as("src_key"),
          concat(substr(col("c_name"), lit(1), p - 1),
            substr(col("c_name"), p + 1, lit(18) - p)).as("d_s"))
      val pairs = graft.ops.Linkage.editJoin1(
        dirty, "src_key", "d_s", cust, "c_custkey", "c_name",
        headLen = 16, tailLen = 2)
      fuzzyLinkReport(dirty, pairs)
    }),

    // τ=2 entity resolution (real-name typo budget): each dirty record
    // carries TWO edits — a deletion in the key region plus a
    // substitution in the shared prefix — and links back through the
    // full τ+1-segment PassJoin ([[graft.ops.Linkage.editJoin]]; the
    // oracle IS the naive levenshtein≤2 join, so any blocking recall
    // loss diverges the hash). Same report shape as q_fuzzy_link.
    //
    // Candidate-prune note: these synthetic keys are PassJoin's
    // adversarial case — all entropy sits in 5 of 18 chars, so EVEN
    // ⌊L/3⌋ segments are single-valued and their clean buckets are the
    // whole catalog (~32M candidates from a 32M cross space — no prune
    // at all, r13's `weak` grade). r14: editJoin's segment boundaries
    // are now chosen by measured per-segment collision costs on side
    // samples (Linkage.chooseSegmentation — min-sum DP over exact
    // subsample simulations), which on this data places the boundaries
    // inside the entropy run: candidates drop 32.1M → 0.75M (43×
    // prune) and the query 24-27 s → ~3.3 s at sf0.1, vs DuckDB's
    // naive levenshtein join at 37.8 s. Exact recall is unconditional
    // — the pigeonhole argument holds for ANY fixed per-length
    // segmentation, and LinkageSpec's recall==naive pins cover the
    // adaptive path at τ∈{1,2,3}. ScaleProof pins the plan through
    // sf1/sf10 on gen_sf1.py's replicated-catalog axis.
    "q_fuzzy_link2" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val dirty = dirtyCustomers(cust)
      val pairs = graft.ops.Linkage.editJoin(
        dirty, "src_key", "d_s", cust, "c_custkey", "c_name", tau = 2)
      fuzzyLinkReport(dirty, pairs)
    }),

    // PERSISTED entity-resolution serving (r14): the q_fuzzy_link2
    // linkage against a BUILD-ONCE catalog index
    // ([[graft.ops.Linkage.editIndexBuild]] — the catalog segmented and
    // bucketed by segment-key hash once per (session, sf dir), like a
    // real deployment's reference catalog) — the probe shuffles only
    // the dirty batch's keys, the catalog scan is Bucketed: true, and
    // there is no per-query sampling/analysis pass. Identical output to
    // q_fuzzy_link2 (recall is exact under ANY segmentation), so the
    // oracle is shared.
    "q_fuzzy_link_serve" -> ((s, d) => {
      val tbl = servedEditIndex(s, d)
      val dirty = dirtyCustomers(Tables.customer(s, d))
      val pairs = graft.ops.Linkage.editIndexProbe(s, tbl,
        dirty, "src_key", "d_s")
      fuzzyLinkReport(dirty, pairs)
    }),

    // CATALOG RETRACTION (r16): the entity-resolution index completes
    // the tombstone lifecycle — build over two thirds of the catalog,
    // append the rest, then WITHDRAW every tenth record
    // ([[graft.ops.Linkage.editIndexDelete]] — the GDPR/CDC case: a
    // withdrawn reference record must stop linking from the next probe
    // on). Deletes append (c_id, seq) rows to the small `_del` side
    // table; the probe reads the live view (broadcast generation
    // filter — the bucketed segment scan keeps zero catalog-side
    // Exchange) and stays EXACT-recall over the survivors: the oracle
    // is the naive levenshtein join against the undeleted catalog.
    // The deleted set intersects the dirty batch's true links (e.g.
    // key 80 ≡ 3 mod 7 and ≡ 0 mod 10), so retraction is load-bearing
    // for n_linked/n_true, not incidental.
    "q_fuzzy_link_tombstone" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val tbl = ("graft_edit_tomb_" + s.sparkContext.applicationId)
        .replaceAll("[^A-Za-z0-9_]", "_")
      graft.ops.Linkage.editIndexBuild(cust.filter(col("c_custkey") % 3 =!= 1),
        "c_custkey", "c_name", tau = 2, tableName = tbl, tableBuckets = 16,
        probeExemplar = Some((dirtyCustomers(cust), "d_s")))
      graft.ops.Linkage.editIndexAppend(cust.filter(col("c_custkey") % 3 === 1),
        "c_custkey", "c_name", tableName = tbl, tableBuckets = 16)
      graft.ops.Linkage.editIndexDelete(
        cust.filter(col("c_custkey") % 10 === 0).select("c_custkey"),
        "c_custkey", tbl)
      val dirty = dirtyCustomers(cust)
      val pairs = graft.ops.Linkage.editIndexProbe(s, tbl,
        dirty, "src_key", "d_s")
      fuzzyLinkReport(dirty, pairs)
    }),

    // blocklist scan: per-pattern occurrence + doc-hit counts over the
    // whole corpus in ONE Aho–Corasick pass per document (graft_multi_count
    // — O(len) per row however large the term dictionary; the naive shape
    // is one contains()/regexp pass PER TERM). The list deliberately nests
    // one pattern inside another ("scan" ⊂ "fast scan") to exercise the
    // suffix-link outputs; all patterns are border-free, so the AC
    // all-occurrences count equals DuckDB's non-overlapping replace count.
    "q_blocklist_match" -> ((s, d) => {
      val pats = blocklistPats
      Tables.documents(s, d)
        .select(posexplode(multiPatternCounts(col("text"), pats))
          .as(Seq("pid", "cnt")))
        .groupBy("pid")
        .agg(sum(when(col("cnt") > 0, 1L).otherwise(0L)).as("n_docs"),
          sum(col("cnt")).cast("long").as("occurrences"))
        .select(element_at(array(pats.map(lit): _*), col("pid") + 1)
          .as("pattern"),
          col("n_docs"), col("occurrences"))
        .orderBy("pattern")
    }),

    // SPARSE blocklist scan (r12): graft_multi_hits emits only the
    // patterns that occur — per-row output O(matches), not O(|dict|),
    // the shape that keeps a 10⁵-term dictionary flat (BlocklistBench).
    // The 48-term dictionary is mostly inert junk, so the dense count
    // vector would be 48 ints/row of mostly zeros where hits carries
    // ~1-8 structs; absent patterns never reach the aggregation at all.
    "q_blocklist_hits" -> ((s, d) => {
      val pats = blocklistHitsDict
      Tables.documents(s, d)
        .select(explode(multiPatternHits(col("text"), pats)).as("h"))
        .select(col("h.pat_id").as("pid"), col("h.cnt").as("cnt"))
        .groupBy("pid")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("cnt")).cast("long").as("occurrences"))
        .select(element_at(array(pats.map(lit): _*), col("pid") + 1)
          .as("pattern"),
          col("n_docs"), col("occurrences"))
        .orderBy("pattern")
    }),

    "q_pii_redact" -> ((s, d) => {
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      graft.core.Transforms.materialized(
          Tables.documents(s, d)
            .withColumn("txt",
              concat(col("text"), lit(" contact "), col("source"),
                lit("@example."), col("lang"))),
          "red", regexp_replace(col("txt"), emailPat, "[EMAIL]"))
        .groupBy("lang")
        .agg(
          sum(when(col("txt") =!= col("red"), 1L).otherwise(0L)).as("n_with_email"),
          sum(length(col("red"))).as("redacted_len"),
          count_distinct(md5(col("red"))).as("n_distinct"))
    }),

    "q_lang_id" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("pred", langGuess(col("text")))
        .groupBy("pred")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("n_correct"))),

    "q_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .agg(count(lit(1)).as("n"),
          count_distinct(fingerprint(col("text"))).as("n_fp"),
          min(fingerprint(col("text"))).as("min_fp"))),

    // ---- near-duplicate detection -----------------------------------
    "q_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d),
          "text", "doc_id", "lang", shingleLen = 3, threshold = 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("j"))),

    // distributed BPE merge training (3 rounds): corpus-wide adjacent-
    // pair counts → argmax merge → literal-replace rewrite, the
    // double-space representation making the greedy merge engine-exact
    // (see Curation.bpeTrainMerges). The oracle unrolls all 3 rounds
    "q_bpe_train" -> ((s, d) =>
      Curation.bpeTrainMerges(Tables.documents(s, d), "text", steps = 3)),

    // tokenize-side complement: train 3 merges, then APPLY them as a
    // purely narrow replace chain and report per-lang compression —
    // the shape a production tokenizer runs corpus-wide after training
    // on a sample
    "q_bpe_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val m = Curation.bpeTrainMerges(docs, "text", steps = 3)
        .orderBy("step").collect()
        .map(r => r.getString(1) -> r.getString(2)).toSeq
      val before = Curation.bpeApply(docs, "text", Seq.empty)
        .withColumnRenamed("bpe_n", "n0")
      Curation.bpeApply(before, "text", m)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n0").as("toks_before"),
          sum("bpe_n").as("toks_after"),
          round(sum("n0").cast("double") / sum("bpe_n"), 4)
            .as("compression"))
        .orderBy("lang")
    }),

    // asymmetric containment near-dup (|Sa∩Sb|/|Sa|): catches the
    // quote/excerpt/subset cases Jaccard misses — same inverted-index
    // candidate join, directional score per ordered pair
    "q_ngram_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d),
          "text", "doc_id", "lang", shingleLen = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"),
          round(col("containment"), 4).as("containment"))),

    // corpus-level n-gram frequency (the canonical map-reduce: one
    // explode + one counting shuffle; top-k with a unique tie-break)
    "q_ngram_counts" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(shinglesN(col("text"), 3)).as("s"))
        .groupBy("s").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("s")).limit(20)),

    // near-dup pairs → connected components → cluster stats (the "keep
    // one per duplicate group" decision surface)
    "q_dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, d),
        "text", "doc_id", "lang", threshold = 0.5)
      val lbl = Dedup.connectedComponents(pairs)
      lbl.groupBy("comp").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_clusters"), sum("sz").as("n_docs"),
          max("sz").as("max_cluster"))
    }),

    // the full near-dedup composition: pairs → clusters → keep min-id
    // representative per cluster + all unpaired docs (the call a corpus
    // curator actually makes)
    "q_neardedup_keep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "lang",
        threshold = 0.5)
      Dedup.keepCanonical(docs, "doc_id", pairs)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars"),
          min("doc_id").as("first_id"))
    }),

    "q_dedup_exact_docs" -> ((s, d) =>
      Dedup.exactDupGroups(Tables.documents(s, d), "text", "doc_id")
        .agg(count(lit(1)).as("n_groups"), sum("n_dups").as("n_docs"),
          max("n_dups").as("max_group"))),

    // Output pairs are EXACT-jaccard-verified candidates, so with the
    // banding tuned for recall (16 bands × 4 rows → P(candidate) >
    // 0.999 at j=0.8, where this corpus's true dups live) the result
    // set equals the all-pairs exact answer — which is the DuckDB
    // oracle (r9; recall verified 1.0 against exact at sf0.01 AND
    // sf0.1: 25/25 and 256/256 pairs, j values bit-equal). The banded
    // candidate generation itself stays spec-pinned in
    // DedupSimilaritySpec's recall/precision cases.
    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashNearDup(Tables.documents(s, d), "text", "doc_id",
        bands = 16, rowsPerBand = 4, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("j"))),

    // prefixBits=12 / maxHamming=8: a 64-bit simhash within Hamming 8 is a
    // meaningful near-dup claim (≤12.5% of feature-vote dimensions differ);
    // the round-2 demo params (8/16) emitted 15k mostly-noise pairs at
    // sf0.01 on the shared-vocabulary synthetic corpus. Precision is
    // spec-pinned in DedupSimilaritySpec alongside recall. Since r9 the
    // DuckDB oracle replays the ENTIRE pipeline bit-exactly — including
    // per-token XXH64 in SQL (see Xxh64Sql) — so this is hash-compared,
    // not rows-only.
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashNearDup(Tables.documents(s, d), "text", "doc_id",
        prefixBits = 12, maxHamming = 8)),

    // per-dim z-scoring then per-label mean standardized norm — the
    // feature-scaling primitive; oracle recomputes (μ, σ) itself, so the
    // check validates the whole standardization algebra
    "q_embed_standardize" -> ((s, d) => {
      val z = Similarity.standardizeDims(Tables.embeddings(s, d), "embedding")
      z.select(col("label"),
          sqrt(aggregate(col("z_vec"), lit(0.0), (a, x) => a + x * x)).as("zn"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), round(avg("zn"), 3).as("avg_znorm"))
    }),

    // per-doc novelty: the fraction of a doc's distinct shingles that
    // occur in NO other document (df=1 after subtracting self) — the
    // inverse signal of boilerplate pruning: high novelty = unique
    // content worth keeping. One shingle-keyed shuffle with map-side
    // combine; per-doc ratio is a second bounded agg.
    "q_novelty" -> ((s, d) => {
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(array_distinct(shinglesN(col("text"), 3))).as("s"))
      val df_ = sh.groupBy("s").agg(count(lit(1)).as("df"))
      sh.join(df_, "s")
        .groupBy("doc_id", "lang")
        .agg((sum(when(col("df") === 1, 1).otherwise(0)).cast("double") /
          count(lit(1))).as("novelty"))
        .groupBy("lang")
        .agg(round(avg("novelty"), 4).as("avg_novelty"),
          round(max("novelty"), 4).as("max_novelty"),
          count(lit(1)).as("n_docs"))
    }),

    // Zipf fit: slope of ln(freq) vs ln(rank) over the token frequency
    // head — the corpus-statistics sanity check (natural text ≈ −1).
    // Two word-keyed shuffles + a 1000-row regression.
    "q_zipf" -> ((s, d) => {
      val freq = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f"))
      // top-1000 FIRST via orderBy+limit (TakeOrderedAndProject — a
      // distributed heap), then rank the bounded 1000-row result: the
      // vocabulary is unbounded, a global row_number over it is not
      val ranked = freq.orderBy(col("f").desc, col("w")).limit(1000)
        .withColumn("r",
          row_number().over(Window.orderBy(col("f").desc, col("w"))))
      ranked.agg(
        round(expr("regr_slope(ln(f), ln(r))"), 4).as("zipf_slope"),
        round(expr("regr_r2(ln(f), ln(r))"), 4).as("r2"),
        count(lit(1)).as("n_terms"))
    }),

    // curriculum staging: quantile-cut the corpus by a difficulty proxy
    // (mean chars per token — longer tokens ≈ harder text) into 4
    // stages; output per-stage composition. Exact-percentile cuts are
    // the oracle surface; percentile_approx is the documented 100 TB
    // dial (see Curation.curriculumStages).
    "q_curriculum" -> ((s, d) => {
      val scored = Tables.documents(s, d).withColumn("score",
        col("n_chars").cast("double") /
          greatest(size(tokens(col("text"))), lit(1)))
      Curation.curriculumStages(scored, "score", nStages = 4)
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"),
          round(min("score"), 4).as("min_s"),
          round(max("score"), 4).as("max_s"),
          sum("n_chars").as("chars"))
    }),

    // k-fold cross-validation assignment: fold = first md5 nibbles mod k
    // — the same engine-portable deterministic coin as hashSplit, so the
    // folds are reproducible anywhere and ~balanced by hash uniformity.
    // Purely narrow (a projection); the rollup validates balance.
    "q_kfold" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("fold",
          (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
            .cast("long") % 5).cast("int"))
        .groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("lang")).as("n_langs"),
          min("doc_id").as("first_id"))),

    // class rebalancing: undersample every label to the minority count
    // with the deterministic md5 coin — balanced-training-set
    // construction, reproducible on any topology
    "q_class_balance" -> ((s, d) =>
      Curation.balanceClasses(Tables.embeddings(s, d), "label", "vec_id")
        .groupBy("label")
        .agg(count(lit(1)).as("n_kept"), min("vec_id").as("first_id"))),

    // hard-negative mining: per query, top-3 most-similar OTHER-label
    // rows (contrastive-pair construction)
    "q_hard_negatives" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.hardNegatives(e.filter(col("vec_id") < 20), e,
          "vec_id", "embedding", "label", k = 3)
        .select(col("q_id"), col("q_label"), col("rnk"), col("n_id"),
          col("n_label"), round(col("sim"), 4).as("sim"))
    }),

    // hybrid retrieval: dense (cosine top-20) and sparse (trigram-shingle
    // jaccard top-20) candidate lists fused by reciprocal rank
    // (k=60, the standard RRF constant) — the RAG two-tower + lexical
    // fusion primitive. vec_id and doc_id are the same id space here.
    //
    // r12: the sparse leg is candidate-generated from the shingle
    // INVERTED INDEX instead of a broadcast-queries × full-corpus scan
    // with per-pair array_union/array_intersect (the one plan the r11
    // verdict flagged as unshippable at 100 TB). Exact equivalence to
    // the all-pairs oracle, by construction:
    //   - shingleHashes() is DISTINCT hashes, so |A∩B| = the number of
    //     matching posting rows in the index join and
    //     |A∪B| = sz_q + sz_n − inter; j = inter/(szq+szn−inter) is the
    //     same two integers divided as size(intersect)/size(union);
    //   - the index has full recall for every pair with inter ≥ 1 (no
    //     hot-shingle cap here — at 100 TB you would df-cap candidate
    //     generation, trading exactness, see Dedup.ngramJaccardPairs);
    //   - a j=0 pair can only reach the sparse top-20 (ordered j DESC,
    //     n_id) when a query has k < 20 positive candidates, and then
    //     only the globally smallest j=0 ids qualify: the 21 smallest
    //     corpus ids (⊇ 20−k smallest j=0 ids + self + any positives)
    //     unioned in with inter=0 cover that tail exactly.
    // The corpus is touched by two narrow passes (shingle kernel +
    // explode); only matched (q,n) pairs shuffle — never shingle arrays.
    "q_hybrid_rrf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dense = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", k = 20)
        .select(col("q_id"), col("n_id"), col("rnk").as("rnk_d"))
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), shingleHashes(col("text"), 3).as("sh"))
      val qs = sh.filter(col("doc_id") < 10)
        .select(col("doc_id").as("q_id"), col("sh").as("q_sh"))
      val qinv = qs.select(col("q_id"), size(col("q_sh")).as("sz_q"),
        explode(col("q_sh")).as("s"))
      val cinv = sh.select(col("doc_id").as("n_id"), size(col("sh")).as("sz_n"),
        explode(col("sh")).as("s"))
      val interCnt = cinv.join(broadcast(qinv), Seq("s"))
        .groupBy("q_id", "n_id", "sz_q", "sz_n")
        .agg(count(lit(1)).as("inter"))
      val fillerIds = sh
        .select(col("doc_id").as("n_id"), size(col("sh")).as("sz_n"))
        .orderBy("n_id").limit(21)
      val filler = broadcast(qs.select(col("q_id"), size(col("q_sh")).as("sz_q")))
        .crossJoin(broadcast(fillerIds))
        .withColumn("inter", lit(0L))
      val w = Window.partitionBy("q_id").orderBy(col("j").desc, col("n_id"))
      val sparse = interCnt.unionByName(filler)
        .groupBy("q_id", "n_id", "sz_q", "sz_n")
        .agg(max("inter").as("inter"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("j",
          when(col("sz_q") + col("sz_n") - col("inter") === 0, lit(0.0))
            .otherwise(col("inter").cast("double") /
              (col("sz_q") + col("sz_n") - col("inter")).cast("double")))
        .withColumn("rnk_s", row_number().over(w))
        .filter(col("rnk_s") <= 20)
        .select("q_id", "n_id", "rnk_s")
      val wf = Window.partitionBy("q_id").orderBy(col("fused").desc, col("n_id"))
      dense.join(sparse, Seq("q_id", "n_id"), "full_outer")
        .withColumn("fused",
          coalesce(lit(1.0) / (lit(60.0) + col("rnk_d")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("rnk_s")), lit(0.0)))
        .withColumn("rnk", row_number().over(wf))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("n_id"),
          round(col("fused"), 6).as("fused"))
    }),

    // ---- embedding similarity ---------------------------------------
    // candidate generation + EXACT re-rank (r12): cosine top-20
    // candidates, then [[graft.ops.Similarity.refineTopK]] re-ranks by
    // true squared L2 to the final 5 — the FAISS "refine" serving
    // pipeline (on concentrated high-dim data ADC ordering noise
    // exceeds true neighbor gaps, so the exact re-rank stage is load-
    // bearing; measured in StructuredEmbeddingsSpec). Candidates and
    // queries broadcast; the corpus is touched by one narrow pass.
    "q_sim_refine" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 10)
      val cands = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", k = 20)
      Similarity.refineTopK(cands, qs, e, "vec_id", "embedding", k = 5)
        .select(col("q_id"), col("rnk"), col("n_id"),
          round(col("dist"), 4).as("dist"))
    }),

    "q_sim_cosine_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          e.filter(col("vec_id") < 10), e, "vec_id", "embedding", k = 5)
        .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).as("sim"))
    }),

    "q_knn_label" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.knnLabel(e.filter(col("vec_id") < 50), e,
        "vec_id", "embedding", "label", k = 10)
    }),

    "q_embed_norm" -> ((s, d) =>
      Tables.embeddings(s, d)
        .groupBy("label")
        .agg(round(sum(normD(col("embedding"))), 2).as("sum_norm"),
          round(sum(dotD(col("embedding"), col("embedding"))), 2).as("sum_sq"),
          count(lit(1)).as("n"))),

    "q_sim_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(e.filter(col("vec_id") < 10), e,
          "vec_id", "embedding", dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
        .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).as("sim"))
    }),

    // Persist-and-probe variant of q_sim_lsh: same parameters, same
    // result multiset (shared oracle), but the corpus signatures go
    // through a bucketed index table so the probe join never shuffles
    // the corpus — the amortized layout for repeated query batches
    "q_sim_lsh_persisted" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val tbl = "graft_lsh_idx_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      Similarity.lshIndexBuild(e, "vec_id", "embedding", dim = 64,
        tableName = tbl, tableBuckets = 8, bits = 6, tables = 4)
      Similarity.lshIndexProbe(s, tbl, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", dim = 64, k = 5, bits = 6, tables = 4,
          probes = 2)
        .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).as("sim"))
    }),

    // LSH-INDEX RETRACTION (r16): delete every seventh vector from the
    // persisted signature table and probe — the live view suppresses
    // the id's signature row in EVERY band table at once (n_id-keyed
    // generation filter), so the result is identical to probing an
    // index built over the surviving corpus, which is exactly what the
    // oracle replays (the filtered-search SQL with the survivors
    // predicate). Top-k REFILL is covered, not just membership: ranks
    // vacated by deleted neighbors must be taken by the next-best live
    // ones or the hash diverges.
    "q_sim_lsh_tombstone" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val tbl = "graft_lsh_tomb_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      Similarity.lshIndexBuild(e, "vec_id", "embedding", dim = 64,
        tableName = tbl, tableBuckets = 8, bits = 6, tables = 4)
      Similarity.lshIndexDelete(
        e.filter(col("vec_id") % 7 === 0).select("vec_id"), "vec_id", tbl)
      Similarity.lshIndexProbe(s, tbl, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", dim = 64, k = 5, bits = 6, tables = 4,
          probes = 2)
        .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).as("sim"))
    }),

    // FILTERED vector search: the label predicate pre-filters the
    // persisted index scan (a parquet PushedFilter on the bucketed
    // read), so selective predicates cannot starve the top-k the way
    // filter-after-rank does; identical to indexing the filtered corpus
    "q_sim_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val tbl = "graft_lshf_idx_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      Similarity.lshIndexBuild(e, "vec_id", "embedding", dim = 64,
        tableName = tbl, tableBuckets = 8, bits = 6, tables = 4,
        metaCols = Seq("label"))
      Similarity.lshIndexProbe(s, tbl, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", dim = 64, k = 5, bits = 6, tables = 4,
          probes = 2, corpusFilter = Some(col("label") === 3))
        .select(col("q_id"), col("rnk"), col("n_id"),
          round(col("sim"), 4).as("sim"))
    }),

    // Misra-Gries heavy hitters; capacity 64 > |distinct event_type|, so
    // the sketch is in its exact regime and DuckDB-oracle-checkable.
    "q_approx_topk" -> ((s, d) => {
      val sketch = udaf(graft.functions.TopKSketch(64))
      Tables.events(s, d)
        .agg(sketch(col("event_type")).as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e._1").as("item"), col("e._2").as("n"))
        .orderBy(col("n").desc, col("item"))
        .limit(5)
    }),

    // HLL sketch: the estimate itself is not bit-comparable across engines
    // (Spark HLL++ vs DuckDB's sketch), so the oracled columns are the
    // exact-distinct side plus `approx_ok` — Spark evaluates the real
    // approx_count_distinct and asserts it inside 5σ of exact (rsd=0.02 →
    // 10% bound); the oracle's twin column is literal TRUE. The sketch path
    // therefore executes (and is timed) in every Verify/bench run, and the
    // tight error bound stays pinned in DedupSimilaritySpec.
    "q_approx_hll" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("exact_u"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_u"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_u"),
          (abs(col("approx_u") - col("exact_u")).cast("double") <=
            lit(0.10) * col("exact_u").cast("double")).as("approx_ok"),
          col("n"))),

    // Mergeable sketches — the piece approx_count_distinct doesn't give
    // you: Datasketches HLL sketches aggregate per partition (here: per
    // day) into a compact binary, and the binaries UNION into the
    // cross-partition estimate without re-reading raw data. That's the
    // 100 TB pattern: a daily rollup job keeps |days| sketch rows, and
    // any date-range distinct count is a union over sketches, not a scan
    // over events. Oracled like q_approx_hll: exact twin + in-query
    // error-bound assertion; the sketch path executes in every run.
    "q_hll_merge" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
      val daily = ev.groupBy("day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          count(lit(1)).as("n_events"))
      val merged = daily.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_m"),
        sum("n_events").as("n_events"),
        count(lit(1)).as("n_days"))
      val exact = ev.agg(count_distinct(col("user_id")).as("exact_m"))
      merged.crossJoin(broadcast(exact))
        .select(col("exact_m"),
          (abs(col("approx_m") - col("exact_m")).cast("double") <=
            lit(0.10) * col("exact_m").cast("double")).as("approx_ok"),
          col("n_events"), col("n_days"))
    }),

    "q_dedup_embed" -> ((s, d) =>
      Similarity.cosineNearDupPairs(Tables.embeddings(s, d),
          "vec_id", "embedding", "label", threshold = 0.35)
        .select(col("id_a"), col("id_b"), round(col("cos"), 2).as("c"))),

    // per-source duplication-rate report (the curation dashboard's
    // first column): share of each source's docs whose exact text
    // fingerprint appears more than once CORPUS-wide. One fingerprint
    // count + one broadcast-back join; fact side never re-shuffled
    "q_dedup_rate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"), md5(col("text")).as("fp"))
      val counts = docs.groupBy("fp").agg(count(lit(1)).as("c"))
      docs.join(counts, Seq("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_duped"),
          round(avg(when(col("c") > 1, 1.0).otherwise(0.0)), 4)
            .as("dup_rate"))
        .orderBy("source")
    }),

    // pairwise-cosine distribution over a deterministic sample (the
    // embedding-collapse diagnostic: a healthy space is spread, a
    // collapsed one piles near 1.0): all pairs of the first 100 ids —
    // sample-bounded by contract, like the brute-force baselines —
    // bucketed into 0.1 bins. dotD/normD folds replay identically in
    // DuckDB's list_dot_product, so bin edges are boundary-exact
    "q_sim_histogram" -> ((s, d) => {
      import graft.functions.VectorFunctions.{dotD, normD}
      val e = Tables.embeddings(s, d).filter(col("vec_id") < 100)
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
      val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .select((dotD(col("va"), col("vb")) /
          (normD(col("va")) * normD(col("vb")))).as("cos"))
        .select(least(floor(col("cos") * 10).cast("int"), lit(9)).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
        .orderBy("bin")
    }),

    // embedding-dimension correlation matrix (the feature-store health
    // check for redundant/collapsed dims): all C(4,2) pairwise corrs of
    // the leading dims in ONE aggregate pass over the corpus
    "q_dim_corr" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(
        (0 until 4).map(i =>
          element_at(col("embedding"), i + 1).cast("double").as(s"d$i")): _*)
      val aggs = for (i <- 0 until 4; j <- i + 1 until 4)
        yield round(corr(col(s"d$i"), col(s"d$j")), 4).as(s"c_${i}_$j")
      e.agg(aggs.head, aggs.tail: _*)
    }),

    // SemDeDup semantic near-dup removal: kmeans clusters as blocking
    // keys, keep-lowest-id inside each cosine-duplicate group — the
    // embedding-space dedup pass a training corpus runs after exact and
    // MinHash dedup. Pair work bounded per cluster; oracle replays the
    // unrolled kmeans chain + the pair predicate + the anti-join
    "q_semdedup" -> ((s, d) =>
      Similarity.semDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 8, iters = 2, threshold = 0.35)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_kept"), min("vec_id").as("first_id"),
          sum("vec_id").cast("long").as("sum_ids"))
        .orderBy("cluster")),

    // Johnson–Lindenstrauss random projection 64→16 dims (deterministic
    // ±1/√16 splitmix64 sign rows): the cheap front-end that makes
    // downstream LSH/kmeans/near-dup 4× narrower at comparable recall.
    // Purely narrow codegen'd folds; exploded to scalar rows for the
    // hash compare (array columns break the driver's comparator)
    "q_random_proj" -> ((s, d) =>
      Similarity.randomProjection(Tables.embeddings(s, d), "embedding",
          dim = 64, dOut = 16)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("pos", "_p")))
        .select(col("vec_id"), col("pos"),
          (round(col("_p"), 4) + lit(0.0)).as("p_r"))),

    // per-label mean embedding (cluster centroid / class prototype);
    // shuffle keyed on (label, pos) with map-side partial averages —
    // reduce side is |labels|·dim keys at any corpus size
    // "+ 0.0" collapses IEEE negative zero — round(-1e-9, 4) renders as
    // -0.0 in DuckDB but 0.0 in Spark, and the driver's canonicalizer
    // does not re-round inside arrays. Output is EXPLODED to scalar
    // (label, pos, c_r) rows: the driver's comparator sorts every column
    // and cannot sort an array column (r8: pandas TypeError on ndarray).
    "q_centroids" -> ((s, d) =>
      Similarity.centroids(Tables.embeddings(s, d), "embedding", "label")
        .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "_c")),
          col("n"))
        .select(col("label"), col("pos"),
          (round(col("_c"), 4) + lit(0.0)).as("c_r"), col("n"))),

    // Lloyd's k-means (semantic clustering / diversity sampling) —
    // deterministic md5 init + fixed iterations, so the oracle unrolls
    // the exact Lloyd's loop in SQL (r9); recovery/determinism also
    // spec-pinned in DedupSimilaritySpec
    "q_kmeans" -> ((s, d) =>
      Similarity.kmeans(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 8, iters = 3)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"), min("vec_id").as("first_id"))),

    // diversity-balanced subset: k-means clusters, deterministic
    // md5-rank quota per cluster (semantic stratification of a training
    // corpus) — exact SQL twin via the unrolled k-means chain (r9);
    // quota/determinism semantics also spec-pinned
    "q_diversity_sample" -> ((s, d) =>
      Similarity.diversitySample(Tables.embeddings(s, d), "vec_id",
          "embedding", k = 8, perCluster = 25, iters = 2)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_kept"), min("vec_id").as("first_id"))),

    // product quantization round-trip: m=4 subspace codebooks (k=8,
    // L2 Lloyd's), encode to 4 code indices, reconstruct, per-label
    // squared-error stats — 64× smaller than float32 at these params;
    // codebook training is deterministic, so the oracle replays the
    // per-subspace L2 kmeans + encode in SQL (r9); exactness/
    // monotonicity also spec-pinned in DedupSimilaritySpec
    "q_pq_roundtrip" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cb = Similarity.pqTrain(e, "vec_id", "embedding",
        m = 4, k = 8, iters = 2)
      Similarity.pqDecode(Similarity.pqEncode(e, "embedding", cb), cb)
        .select(col("label"),
          aggregate(zip_with(
              transform(col("embedding"), _.cast("double")), col("pq_vec"),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x).as("_err"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), round(avg("_err"), 4).as("avg_sq_err"))
    }),

    // ADC top-k over PQ codes: the compressed-domain ANN search (m byte
    // lookups per corpus row instead of dim float multiplies); exact
    // SQL twin via the replayed codebooks (r9), recall spec-pinned
    "q_pq_search" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cb = Similarity.pqTrain(e, "vec_id", "embedding",
        m = 4, k = 8, iters = 2)
      Similarity.pqTopK(
          e.filter(col("vec_id") < 5), Similarity.pqEncode(e, "embedding", cb),
          cb, "vec_id", "embedding", "vec_id", "pq_code", k = 3)
        .select(col("q_id"), col("rnk"), col("n_id"),
          round(col("sim_adc"), 4).as("sim_r"))
    }),

    // symmetric int8 quantization round-trip: per-label reconstruction
    // error stats — the 4×-smaller embedding storage path
    "q_embed_quant" -> ((s, d) => {
      val q = Similarity.dequantizeInt8(
        Similarity.quantizeInt8(Tables.embeddings(s, d), "embedding"))
      q.select(col("label"),
          aggregate(zip_with(col("embedding"), col("deq_vec"),
            (x, y) => abs(x.cast("double") - y)), lit(0.0), (a, x) => a + x)
            .as("err"),
          col("q_scale"))
        .groupBy("label")
        .agg(round(sum("err"), 4).as("sum_err"),
          round(max("q_scale"), 6).as("max_scale"),
          count(lit(1)).as("n"))
    }),

    // IVF-style ANN — deterministic coarse cells (rank-by-|x| over the
    // first nlist dims), fully DuckDB-expressible → exact oracle (r9);
    // recall-vs-exact stays spec-pinned in DedupSimilaritySpec.
    "q_sim_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e.filter(col("vec_id") < 10), e,
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6)
        .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).as("sim"))
    }),

    // persist-and-probe IVF twin: the inverted file is a cell-bucketed
    // table, so probe batches never re-shuffle the corpus
    "q_sim_ivf_persisted" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val tbl = "graft_ivf_idx_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      Similarity.ivfIndexBuild(e, "vec_id", "embedding",
        tableName = tbl, tableBuckets = 8, nlist = 16)
      Similarity.ivfIndexProbe(s, tbl, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6)
        .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).as("sim"))
    }),

    // RAW-IVF RETRACTION (r16): the q_sim_ivf_persisted probe after
    // deleting every seventh vector — the oracle replays the inverted
    // file with the survivors predicate on the corpus side, so rank
    // refill is hash-checked exactly like the LSH twin.
    "q_sim_ivf_tombstone" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val tbl = "graft_ivf_tomb_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      Similarity.ivfIndexBuild(e, "vec_id", "embedding",
        tableName = tbl, tableBuckets = 8, nlist = 16)
      Similarity.ivfIndexDelete(
        e.filter(col("vec_id") % 7 === 0).select("vec_id"), "vec_id", tbl)
      Similarity.ivfIndexProbe(s, tbl, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6)
        .select(col("q_id"), col("rnk"), col("n_id"), round(col("sim"), 4).as("sim"))
    }),

    // IVFADC — the canonical large-corpus ANN serving composition: a
    // COARSE k-means quantizer (raw-L2 Lloyd's, the same training mode
    // PQ codebooks use) partitions the corpus into cells, the persisted
    // inverted file holds PQ codes bucketed by cell, probes prune to
    // nprobe cells (zero corpus-side Exchange) and L2-ADC scores the
    // survivors (m array lookups per candidate). The MACRO-AVERAGED
    // recall@5 of the cell-pruned top-k vs the FULL-scan ADC top-k (the
    // exact baseline for the same compressed metric — isolating what the
    // IVF pruning loses) is asserted IN the query (≥ 0.5; measured
    // 0.72–0.84 across SFs — these synthetic embeddings are near-random,
    // so cell structure is weak and per-query recall varies); the oracle
    // replays coarse centroids + codebooks + cells and pins rows + flag.
    "q_sim_ivfpq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cb = Similarity.pqTrain(e, "vec_id", "embedding",
        m = 4, k = 8, iters = 2)
      val coarse = Similarity.kmeansFit(e, "vec_id", "embedding",
        k = 8, iters = 2, cosine = false)
      val tbl = "graft_ivfpq_idx_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      Similarity.ivfPqIndexBuild(e, "vec_id", "embedding", cb, coarse,
        tableName = tbl, tableBuckets = 8)
      val queries = e.filter(col("vec_id") < 5)
      val ivfadc = Similarity.ivfPqProbe(s, tbl, queries,
        "vec_id", "embedding", cb, coarse, k = 5, nprobe = 4)
      val full = Similarity.pqTopKL2(queries,
        Similarity.pqEncode(e, "embedding", cb), cb,
        "vec_id", "embedding", "vec_id", "pq_code", k = 5)
      val recall = ivfadc.select(col("q_id"), col("n_id"))
        .join(full.select(col("q_id"), col("n_id")).withColumn("_hit", lit(1)),
          Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg((sum(coalesce(col("_hit"), lit(0))) / 5.0).as("_r"))
        .agg(avg("_r").as("_recall"))
      ivfadc.crossJoin(broadcast(recall))
        .select(col("q_id"), col("rnk"), col("n_id"),
          round(col("dist_adc"), 4).as("dist_r"),
          (col("_recall") >= 0.5).as("recall_ok"))
    }),

    // RESIDUAL IVFADC — the canonical FAISS-style refinement: PQ
    // codebooks trained on and codes encoding the residual x − c[cell],
    // so the m×k budget spends its resolution inside the cell (spec pins
    // the reconstruction-error win vs raw codes at equal budget, and
    // all-cells probe ≡ exhaustive residual scan). Probe carries one ADC
    // table per probed cell (|q−c| residual vs codewords); same
    // zero-corpus-Exchange bucketed plan as q_sim_ivfpq. Macro recall@5
    // vs the exhaustive residual-ADC scan asserted in-query; the oracle
    // replays coarse Lloyd's, residuals, codebooks, and the exact folds.
    "q_sim_ivfpq_res" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val coarse = Similarity.kmeansFit(e, "vec_id", "embedding",
        k = 8, iters = 2, cosine = false)
      val tbl = "graft_ivfpqres_idx_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      val cb = Similarity.ivfPqResidualIndexBuild(e, "vec_id", "embedding",
        coarse, m = 4, k = 8, iters = 2, tableName = tbl, tableBuckets = 8)
      val queries = e.filter(col("vec_id") < 5)
      val ivfadc = Similarity.ivfPqResidualProbe(s, tbl, queries,
        "vec_id", "embedding", cb, coarse, k = 5, nprobe = 4)
      val full = Similarity.pqResidualTopKL2(queries, s.table(tbl), cb,
        coarse, "vec_id", "embedding", "n_id", "pq_code", "cell", k = 5)
      val recall = ivfadc.select(col("q_id"), col("n_id"))
        .join(full.select(col("q_id"), col("n_id")).withColumn("_hit", lit(1)),
          Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg((sum(coalesce(col("_hit"), lit(0))) / 5.0).as("_r"))
        .agg(avg("_r").as("_recall"))
      ivfadc.crossJoin(broadcast(recall))
        .select(col("q_id"), col("rnk"), col("n_id"),
          round(col("dist_adc"), 4).as("dist_r"),
          (col("_recall") >= 0.5).as("recall_ok"))
    }),

    // END-TO-END ANN SERVING (r13): the composition a retrieval user
    // actually runs — residual-IVFADC candidate generation with a
    // generous k' = 10·k, then the exact re-rank to the final k
    // ([[graft.ops.Similarity.refineTopK]]), with end-to-end recall@5
    // vs the exact L2 top-5 asserted IN the query (≥ 0.8). The driver's
    // synthetic embeddings are near-uniform random — the adversarial
    // case where space-partitioning recall honestly sits at 0.4–0.5
    // (q_sim_ivfpq pins that) — so this query runs on a CLUSTERED
    // corpus derived deterministically from the same table (see
    // [[clusteredEmbeddings]]): mixture-of-Gaussians geometry like
    // StructuredEmbeddingsSpec's, but exactly replayable in DuckDB.
    "q_sim_ivfpq_refine" -> ((s, d) => {
      // localCheckpoint: ~15 jobs (Lloyd's iterations, PQ training,
      // index build, probe, refine, recall) otherwise each re-scan the
      // parquet and re-derive the transform; the staged table is
      // embeddings-sized (bounded)
      val e = clusteredEmbeddings(s, d).localCheckpoint()
      val coarse = Similarity.kmeansFit(e, "vec_id", "embedding",
        k = 10, iters = 3, cosine = false)
      val tbl = "graft_ivfpqref_idx_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      // m=16, k=32: the code budget StructuredEmbeddingsSpec measured as
      // necessary on this geometry — within-cluster distance gaps sit
      // below m=4 quantization noise, so a small-code ADC ranks cluster-
      // mates near-randomly and the top-k' candidate set dilutes
      // (measured 0.36 candidate recall at sf0.1 with m=4,k=8)
      val cb = Similarity.ivfPqResidualIndexBuild(e, "vec_id", "embedding",
        coarse, m = 16, k = 32, iters = 3, tableName = tbl, tableBuckets = 8)
      val queries = e.filter(col("vec_id") < 5)
      val cands = Similarity.ivfPqResidualProbe(s, tbl, queries,
        "vec_id", "embedding", cb, coarse, k = 50, nprobe = 4)
      val refined = Similarity.refineTopK(cands, queries, e,
        "vec_id", "embedding", k = 5)
      refineRecallReport(queries, refined, e)
    }),

    // PERSISTED ANN SERVING (r14, verdict item 3): q_sim_ivfpq_refine is
    // train+build+probe+refine in ONE query (~15 jobs — the composite a
    // pipeline pays once per corpus); the number a retrieval user cares
    // about is the STEADY-STATE serve — probe+refine against an index
    // that already exists. This query runs against the build-once cached
    // index ([[servedRefineIndex]]): a bucketed inverted-file probe with
    // zero corpus-side Exchange, then the exact re-rank — identical
    // output to q_sim_ivfpq_refine by training determinism (shared
    // oracle), with the bench line recording the serve latency.
    "q_sim_ivfpq_serve" -> ((s, d) => {
      val (tbl, cb, coarse, e) = servedRefineIndex(s, d)
      val queries = e.filter(col("vec_id") < 5)
      val cands = Similarity.ivfPqResidualProbe(s, tbl, queries,
        "vec_id", "embedding", cb, coarse, k = 50, nprobe = 4)
      val refined = Similarity.refineTopK(cands, queries, e,
        "vec_id", "embedding", k = 5)
      refineRecallReport(queries, refined, e)
    }),

    "q_token_bpe" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(sum(size(bpeishTokens(col("text")))).as("n_tokens"),
          count(lit(1)).as("n_docs"))),

    "q_fingerprint_chain" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), chainFingerprint(tokens(col("text"))).as("fp"))
        .groupBy("lang")
        .agg(count_distinct(col("fp")).as("n_fp"), min("fp").as("min_fp"),
          count(lit(1)).as("n"))),

    "q_fingerprint_winnow" -> ((s, d) =>
      Dedup.winnowFingerprints(Tables.documents(s, d), "text", "doc_id",
          shingleLen = 3, window = 4, keep = Seq("lang"))
        .select(col("lang"), explode(col("fps")).as("fp"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_fps"), count_distinct(col("fp")).as("n_distinct"),
          min("fp").as("min_fp"))),

    "q_quality_filter" -> ((s, d) =>
      graft.core.Transforms.materialized(
          Tables.documents(s, d), "toks", tokens(col("text")))
        .filter(size(col("toks")).between(10, 1000)
          && meanTokenLen(col("toks")) < 12.0
          && stopwordRatio(col("toks"), Seq("the", "a", "of", "and")) < 0.5)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars"))),

    // Gopher-rule quality audit (Rae et al. 2021): per-rule rejection
    // counts and pass rate per language — word-count bounds, mean word
    // length, alphabetic-word fraction, stop-word hits. All per-row HOF
    // folds, zero shuffle before the |langs|-row aggregate.
    "q_gopher_rules" -> ((s, d) =>
      Curation.gopherFlags(Tables.documents(s, d), "text")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(when(col("ok_words"), 0L).otherwise(1L)).as("rej_words"),
          sum(when(col("ok_mean_len"), 0L).otherwise(1L)).as("rej_mean_len"),
          sum(when(col("ok_alpha"), 0L).otherwise(1L)).as("rej_alpha"),
          sum(when(col("ok_stop"), 0L).otherwise(1L)).as("rej_stop"),
          round(avg("mean_word_len"), 4).as("avg_wlen"),
          round(avg("alpha_frac"), 4).as("avg_alpha"),
          sum("stop_hits").cast("long").as("stop_hits"))
        .orderBy("lang")),

    // ---- corpus curation --------------------------------------------
    // benchmark decontamination: every doc's n-gram overlap against a
    // deterministic "eval suite" (docs with doc_id % 97 == 0), benchmark
    // shingle hashes broadcast — the corpus is never shuffled by shingle
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Curation.contaminationCounts(docs, "text", "doc_id", bench, "text")
        .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_contam") > 0, 1L).otherwise(0L)).as("n_contaminated"),
          sum("n_contam").as("sum_overlap"),
          max("n_contam").as("max_overlap"))
    }),

    // streaming-safe decontamination: same filter semantics as
    // q_decontaminate's minOverlap=1 drop, but per-row against a
    // broadcast benchmark hash set — zero shuffle, composes into
    // append-mode streams (see the IntegrationSpec ingest pipeline)
    "q_decontaminate_stream" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Curation.decontaminateStream(docs, "text", bench, "text")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars"),
          min("doc_id").as("first_id"))
    }),

    // per-benchmark-item leak report (decontamination reversed): which
    // eval items are burned and how badly — all shuffles bounded by the
    // benchmark shingle vocabulary, the corpus is never shuffled
    "q_contamination_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Curation.contaminationReport(docs, "text", bench, "doc_id", "text")
    }),

    // deterministic md5-threshold train/test split: same doc → same split
    // on any engine/run/topology; one narrow projection at any scale
    "q_split_train_test" -> ((s, d) =>
      Curation.hashSplit(Tables.documents(s, d), "doc_id", trainFrac = 0.8)
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))),

    // importance-weighted sampling: per-ROW keep probability (here a
    // length proxy for quality — clamp(n_chars/400, ·, 1)) instead of
    // the per-stratum rate. Same engine-portable mechanic as hashSplit:
    // the row's md5 4-hex prefix compares against its own
    // printf('%04x')-rendered threshold, so the verdict is a pure
    // projection — deterministic on any engine, run, or partition
    // layout, and the keep rate tracks the weight within 2⁻¹⁶
    "q_sample_importance" -> ((s, d) => {
      val w = least(lit(1.0), col("n_chars") / lit(400.0))
      Tables.documents(s, d)
        .withColumn("thr", format_string("%04x",
          least(lit(65535), floor(w * 65536).cast("int"))))
        .filter(substring(md5(col("doc_id").cast("string")), 1, 4) <
          col("thr"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"),
          min("doc_id").as("first_id"))
        .orderBy("lang")
    }),

    // deterministic per-language sampling rates (md5-threshold per
    // stratum) — reproducible subsets independent of partition layout
    "q_sample_stratified" -> ((s, d) =>
      Curation.sampleStratified(Tables.documents(s, d), "doc_id", "lang",
          fractions = Map("en" -> 0.5, "de" -> 0.25), defaultFrac = 0.1)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars"),
          min("doc_id").as("first_id"))),

    // token-budget packing (concat-and-chunk): docs per chunk stats
    "q_pack_budget" -> ((s, d) =>
      Curation.packByTokenBudget(Tables.documents(s, d),
          groupCol = "lang", orderCol = "doc_id", textCol = "text",
          budget = 4096L)
        .groupBy("lang")
        .agg(count_distinct(col("pack_id")).as("n_packs"),
          sum("n_tokens").as("total_tokens"),
          max("pack_id").as("max_pack"))),

    // within-doc repetition ratio (boilerplate / stuffing detector)
    "q_repetition" -> ((s, d) =>
      Curation.repetitionScore(Tables.documents(s, d), "text")
        .groupBy("lang")
        .agg(round(sum("repetition"), 2).as("sum_rep"),
          round(max("repetition"), 2).as("max_rep"),
          count(lit(1)).as("n"))),

    // corpus-level boilerplate removal (C4-style): drop segments whose
    // document frequency exceeds the cap, reassemble survivors in order.
    // The test corpus has no newlines, so segments are tokens here
    // (DF-based vocabulary pruning — same machinery, delim = " ").
    "q_df_prune" -> ((s, d) =>
      Curation.pruneFrequentSegments(Tables.documents(s, d), "text", "doc_id",
          maxDf = 380L, delim = " ")
        .select(col("doc_id"), col("text_pruned"), col("n_kept"))),

    // fixed-size token-window chunking with overlap — the context-window
    // packing step before embedding/training (purely narrow explode)
    "q_chunk_tokens" -> ((s, d) =>
      Curation.chunkByTokens(Tables.documents(s, d), "text", "doc_id",
        chunkSize = 32, overlap = 8)),

    // corpus-wide exact span dedup (Lee et al. windowed substring
    // removal): only the first occurrence of each 32-token span survives
    "q_span_dedup" -> ((s, d) =>
      Dedup.spanDedup(Tables.documents(s, d), "doc_id", "text",
          windowTokens = 32)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chunks_kept").as("chunks_kept"),
          sum("n_tokens_kept").as("tokens_kept"),
          sum(length(col("text_dedup"))).as("chars_kept"),
          sum(when(col("n_chunks_kept") === 0, 1L).otherwise(0L))
            .as("n_emptied"))),

    // incremental dedup against a PERSISTED fingerprint index: build on
    // batch 0, dedup batch 1 against it, append batch 1's novel
    // fingerprints, dedup batch 2 against the GROWN index — survivors of
    // batches 1+2 are first-occurrence-wins across the batch sequence
    "q_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tbl = "graft_dd_idx_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      val batch = (b: Int) => docs.filter(col("doc_id") % 3 === b)
      Dedup.dedupIndexBuild(batch(0), "text", "doc_id", tbl, tableBuckets = 8)
      val n1 = Dedup.dedupAgainstIndex(s, tbl, batch(1), "text", "doc_id")
        .localCheckpoint() // materialize BEFORE the append extends the index
      Dedup.dedupIndexAppend(s, tbl, n1, "text", "doc_id", tableBuckets = 8)
      val n2 = Dedup.dedupAgainstIndex(s, tbl, batch(2), "text", "doc_id")
      n1.withColumn("batch", lit(1L)).unionByName(n2.withColumn("batch", lit(2L)))
        .select(col("doc_id"), col("batch"))
    }),

    // PERSISTED-INDEX DELETES (r15): the dedup-index lifecycle gains
    // retraction — build over batch 0, append batch 1's novel
    // fingerprints, tombstone every indexed doc with doc_id % 5 == 0
    // ([[graft.ops.Dedup.fingerprintIndexDelete]] — per-FINGERPRINT
    // semantics, the fp row retracts entirely so a later batch
    // re-inserts it as novel), then probe batch 2 against
    // build ∪ append − delete. Tombstones live in a small side table
    // anti-joined at probe time (broadcast — the bucketed index scan
    // keeps its zero-Exchange shape) and fold into the base on
    // fingerprintIndexCompact; the oracle replays the live fp set.
    "q_dedup_tombstone" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tbl = "graft_dd_tomb_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      val batch = (b: Int) => docs.filter(col("doc_id") % 3 === b)
      Dedup.dedupIndexBuild(batch(0), "text", "doc_id", tbl, tableBuckets = 8)
      val n1 = Dedup.dedupAgainstIndex(s, tbl, batch(1), "text", "doc_id")
        .localCheckpoint()
      Dedup.dedupIndexAppend(s, tbl, n1, "text", "doc_id", tableBuckets = 8)
      Dedup.dedupIndexDelete(s, tbl,
        docs.filter(col("doc_id") % 3 =!= 2 && col("doc_id") % 5 === 0), "text")
      Dedup.dedupAgainstIndex(s, tbl, batch(2), "text", "doc_id")
        .select(col("doc_id"))
    }),

    // content-defined chunking dedup: boundaries where the rolling
    // 8-char window hash ≡ 0 (mod 64) — block dedup that survives
    // insertions shifting every downstream offset (fixed grids and
    // fixed-k slides both re-cut; CDC re-synchronizes past the edit).
    // All-BIGINT output: chunk counts, distinct chunks, duplicated
    // occurrences and their character mass
    "q_dedup_cdc" -> ((s, d) => {
      val ch = Dedup.cdcChunks(Tables.documents(s, d), "text", "doc_id")
      // group by (xxhash64, length), NOT the chunk text: the chunk
      // strings are consumed map-side and only 16-byte keys shuffle —
      // the same hash-key discipline as every other dedup op here
      // (grouping by text measured 12.5× for 10× data at the sf10
      // point: the whole corpus was shuffling as strings). The DuckDB
      // oracle keeps grouping by chunk text, so the hash-compare
      // doubles as an xxh64-collision canary.
      ch.select(xxhash64(col("chunk")).as("_h"), length(col("chunk")).as("len"))
        .groupBy("_h", "len").agg(count(lit(1)).as("cnt"))
        .agg(sum("cnt").cast("long").as("n_chunks"),
          count(lit(1)).as("n_distinct"),
          sum(col("cnt") - 1).cast("long").as("dup_occ"),
          sum((col("cnt") - 1) * col("len")).cast("long").as("dup_chars"),
          sum(col("cnt") * col("len")).cast("long").as("total_chars"))
    }),

    // sliding-window duplicated-substring spans (full Lee et al. shape:
    // any alignment, cross- and within-document; q_span_dedup is the
    // fixed-grid approximation) — maximal merged spans per document
    "q_dedup_substring" -> ((s, d) =>
      Dedup.duplicateSpans(Tables.documents(s, d), "text", "doc_id", k = 5)),

    // per-document unigram entropy (quality/diversity signal) — zero
    // shuffle: run-length fold over the sorted token array per row
    "q_token_entropy" -> ((s, d) =>
      Curation.tokenEntropy(Tables.documents(s, d), "text")
        .groupBy("lang")
        .agg(round(sum("entropy"), 2).as("sum_ent"),
          round(max("entropy"), 2).as("max_ent"),
          count(lit(1)).as("n"))),

    // sample to a target language mixture with max retention: binding
    // stratum kept in full, others md5-threshold down-sampled
    "q_mix_weights" -> ((s, d) =>
      Curation.mixToWeights(Tables.documents(s, d), "doc_id", "lang",
          weights = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_id"),
          sum("n_chars").as("chars"))),

    // ---- TF-IDF / keyword extraction ---------------------------------
    // top-5 keywords per document by tf·idf — TF is the zero-shuffle
    // run-length kernel; DF is the only full shuffle (distinct doc-term
    // pairs, map-side combined); idf join left to AQE (broadcast when the
    // vocabulary is dimension-sized)
    "q_tfidf_keywords" -> ((s, d) =>
      TfIdf.keywords(Tables.documents(s, d), "doc_id", "text", k = 5)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), col("rnk"), col("term"),
          round(col("tfidf"), 2).as("score_r"))),

    // Okapi BM25 keyword search: every doc matching ≥1 query term scored
    // (first-stage ranker ahead of embedding re-rank); query-term filter
    // runs inside the counts array pre-explode, df/idf broadcast back
    "q_bm25_search" -> ((s, d) =>
      TfIdf.bm25(Tables.documents(s, d), "doc_id", "text",
          queryTerms = Seq("spark", "merge", "window"))
        .select(col("doc_id"), col("n_terms"),
          round(col("score"), 2).as("score_r"))),

    // same scorer against a PERSISTED inverted posting index: build
    // bucketed-by-term posting lists + additive stats, probe touches
    // only the query terms' buckets — the corpus text is never read
    "q_bm25_persisted" -> ((s, d) => {
      val tbl = "graft_inv_idx_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      TfIdf.searchIndexBuild(Tables.documents(s, d), "doc_id", "text",
        tbl, tableBuckets = 8)
      TfIdf.searchIndexProbe(s, tbl, Seq("spark", "merge", "window"))
        .select(col("doc_id"), col("n_terms"),
          round(col("score"), 2).as("score_r"))
    }),

    // POSTING-INDEX RETRACTION (r16): build over two thirds of the
    // corpus, append the rest, then retract every fifth document
    // ([[graft.ops.TfIdf.searchIndexDelete]]). A delete must undo BOTH
    // halves of the doc's footprint: its posting rows (tombstoned by
    // doc_id, suppressed at probe time by the broadcast generation
    // filter) AND its contribution to the additive (n_docs, total_dl)
    // corpus stats (one negative row computed from the live `_docs`
    // side table — so a re-delete retracts zero) — otherwise the
    // retracted doc keeps ranking and its length keeps skewing avgdl
    // for every OTHER doc's score. The oracle is the direct BM25
    // scorer over the surviving corpus: every score must match, which
    // checks the stats retraction, not just the posting suppression.
    // TRANSPOSED probe — standing-query scoring of an INCOMING batch
    // (r16): q_bm25_persisted ranks the INDEXED corpus for the query;
    // this scores a NEW document batch against the index's statistics
    // (df_t over live postings, N/avgdl from the additive stats) — the
    // classify-at-arrival half of text search and the batch twin of
    // [[graft.streaming.StreamingOps.bm25ScoreStream]] (alerting at
    // ingest; stream ≡ batch pinned across an index append AND delete
    // in StreamingSpec). Per-doc work is one termCounts pass + a fold
    // over ≤ |queryTerms| entries against ONE broadcast stats row —
    // the batch never shuffles, whatever the corpus size.
    "q_bm25_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tbl = "graft_inv_score_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      TfIdf.searchIndexBuild(docs, "doc_id", "text", tbl, tableBuckets = 8)
      TfIdf.searchIndexScoreDocs(s, tbl, docs.filter(col("doc_id") < 60),
          "doc_id", "text", Seq("spark", "merge", "window"))
        .select(col("doc_id"), col("n_terms"),
          round(col("score"), 2).as("score_r"))
    }),

    "q_bm25_tombstone" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tbl = "graft_inv_tomb_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      TfIdf.searchIndexBuild(docs.filter(col("doc_id") % 3 =!= 2),
        "doc_id", "text", tbl, tableBuckets = 8)
      TfIdf.searchIndexAppend(docs.filter(col("doc_id") % 3 === 2),
        "doc_id", "text", tbl, tableBuckets = 8)
      TfIdf.searchIndexDelete(s, tbl,
        docs.filter(col("doc_id") % 5 === 0).select("doc_id"), "doc_id")
      TfIdf.searchIndexProbe(s, tbl, Seq("spark", "merge", "window"))
        .select(col("doc_id"), col("n_terms"),
          round(col("score"), 2).as("score_r"))
    }),

    // exact substring search through the char-trigram posting index
    // (pg_trgm design): conjunctive trigram pruning + contains() verify
    // — exact results, index-pruned cost, bucket-pruned posting scan
    "q_substr_search" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tbl = "graft_trgm_idx_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      TfIdf.trigramIndexBuild(docs, "doc_id", "text", tbl, tableBuckets = 8)
      TfIdf.trigramIndexProbe(s, tbl, docs, "doc_id", "text", "merge window")
        .orderBy("doc_id")
    }),

    // TRIGRAM-INDEX RETRACTION (r16): build over two thirds of the
    // corpus, append the rest, retract every fourth document — the
    // probe's candidate set comes from live postings only
    // (doc_id-keyed generation filter, same broadcast live-view shape
    // as every persisted index), so a retracted document can no longer
    // be returned even though its text still contains the query. The
    // oracle is the plain substring scan over the survivors.
    "q_substr_tombstone" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tbl = "graft_trgm_tomb_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      TfIdf.trigramIndexBuild(docs.filter(col("doc_id") % 3 =!= 2),
        "doc_id", "text", tbl, tableBuckets = 8)
      TfIdf.trigramIndexAppend(docs.filter(col("doc_id") % 3 === 2),
        "doc_id", "text", tbl, tableBuckets = 8)
      TfIdf.trigramIndexDelete(s, tbl,
        docs.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
      TfIdf.trigramIndexProbe(s, tbl, docs, "doc_id", "text", "merge window")
        .orderBy("doc_id")
    }),

    // typo-tolerant trigram matching: "merge windoz" (one-char typo)
    // still finds the "merge window" docs — ≥90% of the query's
    // distinct trigrams present; integer threshold, engine-exact
    "q_fuzzy_match" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tbl = "graft_trgm_fz_" + s.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
      TfIdf.trigramIndexBuild(docs, "doc_id", "text", tbl, tableBuckets = 8)
      TfIdf.trigramFuzzyProbe(s, tbl, "merge windoz", minFrac = 0.9)
        .orderBy("doc_id")
    }),

    // corpus-wide frequent PHRASE mining: top word trigrams by
    // occurrence (boilerplate surface — the thing CDC/span dedup then
    // removes). Partial aggregation means the shuffle carries only each
    // partition's distinct phrases; the true heavy-hitter head at
    // 100 TB is the sketch path (q_approx_topk/TopKSketch) — this is
    // the exact twin with a deterministic (count, phrase) total order
    "q_frequent_phrases" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(shinglesN(col("text"), 3)).as("phrase"))
        .groupBy("phrase")
        .agg(count(lit(1)).as("n_occ"), countDistinct("doc_id").as("n_docs"))
        .orderBy(desc("n_occ"), asc("phrase"))
        .limit(20)),

    // corpus vocabulary head: 20 most document-frequent terms
    "q_doc_freq" -> ((s, d) =>
      TfIdf.documentFrequencies(Tables.documents(s, d), "text")
        .orderBy(desc("df_t"), asc("term"))
        .limit(20)),

    // ---- collocations: bigram PMI over the corpus --------------------
    // pointwise mutual information ln(p(xy)/(p(x)p(y))) — the classic
    // phrase-mining signal (word2vec's phrase pass). Bigrams come from a
    // zip of the token array with its own tail (pure array ops, no
    // positional self-join); unigram and bigram counts are two shuffles
    // on word keys with map-side combine, and the corpus totals join
    // back as broadcast scalars, so the whole thing is 100 TB-safe:
    // nothing driver-side, no |corpus|² anywhere
    "q_collocations_pmi" -> ((s, d) => {
      val toks = graft.core.Transforms.materialized(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "toks", tokens(col("text")))
      val uni = toks.select(explode(col("toks")).as("w"))
      val uniCnt = uni.groupBy("w").agg(count(lit(1)).as("c_w"))
      val bi = toks
        .select(explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("b"))
        .select(col("b.0").as("w1"), col("b.1").as("w2"))
      val biCnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      val nU = uni.agg(count(lit(1)).cast("double").as("n_u"))
      val nB = bi.agg(count(lit(1)).cast("double").as("n_b"))
      biCnt
        .join(uniCnt.withColumnRenamed("w", "w1")
          .withColumnRenamed("c_w", "c_w1"), "w1")
        .join(uniCnt.withColumnRenamed("w", "w2")
          .withColumnRenamed("c_w", "c_w2"), "w2")
        .crossJoin(broadcast(nU)).crossJoin(broadcast(nB))
        .filter(col("c_xy") >= 5)
        // floor(x*100+0.5)/100, not round(): deterministic across engines
        .withColumn("pmi", floor(log(col("c_xy").cast("double") *
            col("n_u") * col("n_u") /
            (col("n_b") * col("c_w1") * col("c_w2"))) * 100 + 0.5) / 100)
        .select("w1", "w2", "c_xy", "pmi")
        .orderBy(desc("pmi"), asc("w1"), asc("w2"))
        .limit(20)
    }),

    // ---- stopword filtering (content-token extraction) ---------------
    // the cheap, universal first pass of every text pipeline: a codegen'd
    // array lambda per row, zero shuffles — embarrassingly parallel at
    // any scale
    "q_stopword_filter" -> ((s, d) => {
      val stop = Seq("the", "a", "of", "and", "to", "in", "is")
      graft.core.Transforms.materialized(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "toks", tokens(col("text")))
        .withColumn("content",
          filter(col("toks"), t => !t.isin(stop: _*)))
        .select(col("doc_id"),
          size(col("toks")).as("n_total"),
          size(col("content")).as("n_content"),
          array_join(slice(col("content"), 1, 8), " ").as("head_content"))
    }),

    // ---- RAKE keyword extraction (Rose et al. 2010) ------------------
    // candidate phrases = maximal stopword-free token runs (phrase id =
    // running stopword count per doc — a DOC-partitioned window, bounded
    // by document length); word score = degree/freq over all phrase
    // occurrences; phrase score = in-order fold of its word scores
    // (bit-identical to the DuckDB list_reduce twin). Top 10 phrases
    "q_rake" -> ((s, d) => {
      val stop = Seq("the", "a", "of", "and", "to", "in", "is", "for",
        "on", "with")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
        .withColumn("is_stop", col("w").isin(stop: _*))
      val wDoc = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val content = toks
        .withColumn("pk", sum(when(col("is_stop"), 1L).otherwise(0L)).over(wDoc))
        .filter(!col("is_stop"))
      val phr = content.groupBy("doc_id", "pk")
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("w")))),
            p => p("w")), " ").as("phrase"),
          count(lit(1)).as("plen"))
      val withLen = content.join(phr, Seq("doc_id", "pk"))
      val wordScore = withLen.groupBy("w")
        .agg((sum("plen").cast("double") / count(lit(1))).as("score"))
      withLen.join(wordScore, "w")
        .groupBy("doc_id", "pk", "phrase")
        .agg(aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("score")))),
            p => p("score")),
          lit(0.0), (a, x) => a + x).as("s_occ"))
        .groupBy("phrase")
        .agg(count(lit(1)).as("n_occ"), round(max("s_occ"), 4).as("rake"))
        .orderBy(col("rake").desc, col("phrase")).limit(10)
    }),

    // ---- prefix near-dup groups --------------------------------------
    // dedup on the normalized head of the document (URL-less mirror /
    // boilerplate-clone detector): one md5-keyed shuffle with map-side
    // combine — the cheapest useful near-dup pass, run before the
    // expensive MinHash stage to shrink its input
    "q_prefix_dedup" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("pfx", md5(regexp_replace(
          lower(substring(col("text"), 1, 64)), "\\s+", " ")))
        .groupBy("pfx")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical_id"))
        .filter(col("n_docs") > 1)
        .orderBy("canonical_id")),

    // ---- sentence segmentation stats ---------------------------------
    // regex sentence split + per-doc stats: narrow per-row work; the
    // floor-round idiom keeps the per-row average engine-deterministic
    // (avg chars/n hits exact .xx5 midpoints whenever n divides 200)
    "q_sentence_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("sents",
          filter(split(col("text"), "[.!?]+"), x => length(trim(x)) > 0))
        .filter(size(col("sents")) > 0)
        .select(col("doc_id"), size(col("sents")).as("n_sents"),
          (floor(aggregate(col("sents"), lit(0L),
              (acc, x) => acc + length(trim(x))).cast("double")
            / size(col("sents")) * 100 + 0.5) / 100).as("avg_sent_chars"))),

    // ---- sentence-aware chunking (RAG ingestion) ---------------------
    // q_chunk_tokens cuts mid-sentence; this variant segments on
    // sentence boundaries FIRST (hard-splitting any sentence longer
    // than maxSeg tokens — the standard fallback for punctuation-poor
    // text, which this corpus is), then assigns each segment to a chunk
    // by its cumulative token start-offset (floor(cum_before/budget)),
    // so chunk boundaries land between segments. Two narrow explodes +
    // one per-doc ROWS window + a (doc, chunk) aggregate — the same
    // shuffle budget as the token chunker, boundary-aligned.
    "q_chunk_sentences" -> ((s, d) => {
      val budget = 40
      val maxSeg = 12
      val w = Window.partitionBy("doc_id").orderBy("pos", "sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(
          filter(split(col("text"), "[.!?]+"),
            x => length(trim(x)) > 0)).as(Seq("pos", "sent")))
        .withColumn("n_tok", size(split(trim(col("sent")), "\\s+")))
        .select(col("doc_id"), col("pos"), posexplode(
          transform(sequence(lit(0),
              ceil(col("n_tok") / lit(maxSeg.toDouble)).cast("int") - 1),
            i => least(lit(maxSeg), col("n_tok") - i * maxSeg)))
          .as(Seq("sub", "seg_tok")))
        .withColumn("cum", sum("seg_tok").over(w))
        .withColumn("chunk_id",
          floor((col("cum") - col("seg_tok")) / budget).cast("int"))
        .groupBy("doc_id", "chunk_id")
        .agg(count(lit(1)).as("n_segs"), sum("seg_tok").as("chunk_tokens"))
        .orderBy("doc_id", "chunk_id")
    }),

    // ---- multimodal plumbing (binary columns + typed metadata) -------
    "q_multimodal_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"), col("text").cast("binary").as("payload"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(octet_length(col("payload"))).as("n_bytes"),
          min(octet_length(col("payload"))).as("min_bytes"))),

    // decode / resize / frame-sample / feature pipeline over binary
    // payloads — STUB codecs (deterministic JVM arithmetic), which since
    // r9 the DuckDB oracle replays exactly (mod-2^32 polynomial hash in
    // SQL); the Spark plumbing (schema, UDF batch shape, explode) is the
    // real surface, and MultimodalSpec pins the per-row semantics.
    "q_multimodal_decode" -> ((s, d) => {
      val media = fanned(Tables.documents(s, d))
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"), col("source").as("mime"))
      val decoded = Multimodal.resize(Multimodal.decodeMeta(media), 640, 480)
      decoded.groupBy("mime")
        .agg(count(lit(1)).as("n"),
          sum(when(col("meta.ok"), 1L).otherwise(0L)).as("n_ok"),
          max(col("meta.width")).as("max_w"),
          sum(octet_length(col("payload"))).as("resized_bytes"))
    }),

    // audio-path twin of the decode pipeline: stub PCM (byte−64 per
    // sample — SQL-replayable like the decode hash) → 16-sample RMS +
    // zero-crossing windows, the VAD/segmentation front-end features.
    // One narrow UDF explode per media row, no shuffle before the
    // per-mime aggregate
    "q_multimodal_audio" -> ((s, d) => {
      val media = fanned(Tables.documents(s, d).filter(col("doc_id") < 300))
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"), col("source").as("mime"))
      Multimodal.audioWindows(media, window = 16)
        .groupBy("mime")
        .agg(count(lit(1)).as("n_windows"),
          round(sum("rms"), 2).as("sum_rms"),
          sum("zc").cast("long").as("sum_zc"),
          sum(when(col("n_samples") < 16, 1L).otherwise(0L)).as("n_partial"))
        .orderBy("mime")
    }),

    // REAL-codec audio pipeline: each doc_id seeds a genuine RIFF/WAVE
    // file (Codecs.synthWav — every 5th has a LIST chunk between fmt and
    // data), decoded by the real chunk-walking parser + 16-bit LE PCM
    // reader; energy/zero-crossings are exact integers so the DuckDB
    // twin replays decode(encode(seed)) with no float drift. The codec
    // itself (arbitrary layouts, corruption) is pinned in MultimodalSpec.
    "q_wav_decode" -> ((s, d) => {
      val wavUdf = udf((seed: Long) => Codecs.synthWav(seed))
      val media = fanned(Tables.documents(s, d).filter(col("doc_id") < 400))
        .select(col("doc_id").as("media_id"), wavUdf(col("doc_id")).as("payload"))
      Multimodal.wavSignalStats(Multimodal.decodeWavMeta(media))
        .groupBy(col("wav_meta.sample_rate").cast("long").as("sample_rate"))
        .agg(count(lit(1)).as("n_media"),
          sum(when(col("wav_meta.ok"), 1L).otherwise(0L)).as("n_ok"),
          sum(col("wav_meta.n_frames").cast("long")).as("sum_frames"),
          sum(col("wav_meta.channels").cast("long")).as("sum_channels"),
          sum(col("sig.energy")).as("total_energy"),
          sum(col("sig.zc")).as("total_zc"))
        .orderBy("sample_rate")
    }),

    // REAL-codec image pipeline: seeded 24bpp bottom-up BMPs decoded by
    // the real header parser + padded-stride pixel walk (pixel_sum walks
    // rows in display order through the offset/stride math)
    "q_bmp_decode" -> ((s, d) => {
      val bmpUdf = udf((seed: Long) => Codecs.synthBmp(seed))
      val media = fanned(Tables.documents(s, d).filter(col("doc_id") < 300))
        .select(col("doc_id").as("media_id"), bmpUdf(col("doc_id")).as("payload"))
      Multimodal.decodeBmpMeta(media)
        .groupBy(col("bmp_meta.width").cast("long").as("width"))
        .agg(count(lit(1)).as("n_media"),
          sum(when(col("bmp_meta.ok"), 1L).otherwise(0L)).as("n_ok"),
          sum(col("bmp_meta.height").cast("long")).as("sum_height"),
          sum(col("pixel_sum")).as("sum_pixels"))
        .orderBy("width")
    }),

    // IMAGE NEAR-DUP (r13): perceptual dHash over real decoded pixels
    // ([[graft.ops.Codecs.bmpDHash]] — header parse, stride/bottom-up
    // walk, integer ITU-601 grayscale, 9×8 comparison grid) + the
    // Hamming-banded self-join ([[graft.ops.Dedup.hammingNearDup]],
    // 4 × 16-bit bands: pigeonhole recall 1.0 at hamming ≤ 3). Corpus:
    // one synthetic BMP per DOCUMENT row (r14: the cap of 400 is gone —
    // the corpus scales with the table, 5k payloads at sf0.1 / 50k at
    // sf1, so the banded join earns real bench + ScaleProof signal) in
    // planted pairs — (2i, 2i+1) share seed i, the odd sibling has one
    // pixel byte perturbed, which flips at most ONE dHash bit, so every
    // planted pair survives the verify; unrelated images sit at
    // hamming ≈ 32 and die there.
    "q_image_phash" -> ((s, d) => {
      val bmpUdf = udf((id: Long) => Codecs.synthBmpNear(id / 2, (id % 2).toInt * 128))
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), bmpUdf(col("doc_id")).as("payload"))
      Dedup.hammingNearDup(Multimodal.imageDHash(media),
        prefixBits = 16, maxHamming = 3, bands = 4)
    }),

    // REAL multimodal retrieval chain (r13): decode → feature-extract
    // (the 72-dim integer-exact grayscale grid,
    // [[graft.ops.Codecs.bmpGrayFeatures]]) → cosine kNN over the
    // feature vectors with the SAME Similarity op the embedding table
    // uses. Planted near-dup siblings rank as each query's top
    // neighbor; features are exact integers so the dot products are
    // bit-replayable in the oracle.
    "q_image_knn" -> ((s, d) => {
      val bmpUdf = udf((id: Long) => Codecs.synthBmpNear(id / 2, (id % 2).toInt * 128))
      val media = fanned(Tables.documents(s, d)) // r14: corpus scales with the table
        .select(col("doc_id").as("media_id"), bmpUdf(col("doc_id")).as("payload"))
      val feats = Multimodal.imageFeatures(media)
      Similarity.bruteForceTopK(feats.filter(col("id") < 10), feats,
          "id", "features", k = 3)
        .select(col("q_id"), col("rnk"), col("n_id"),
          round(col("sim"), 4).as("sim"))
    }),

    // REAL image resize (r13): decode → exact integer box-filter 2×
    // downsample → RE-ENCODE as a valid BMP → decode AGAIN with the
    // real parser ([[graft.ops.Codecs.resizeBmp24]]) — the
    // resize-then-anything chain all on real bytes; the aggregate pins
    // output dims and the exact box-mean pixel sums
    "q_image_resize" -> ((s, d) => {
      val bmpUdf = udf((seed: Long) => Codecs.synthBmpNear(seed, 0))
      val media = fanned(Tables.documents(s, d).filter(col("doc_id") < 300))
        .select(col("doc_id").as("media_id"), bmpUdf(col("doc_id")).as("payload"))
      val resized = Multimodal.resizeImages(media, factor = 2)
        .select(col("media_id"), col("payload_resized").as("payload"))
      Multimodal.decodeBmpMeta(resized)
        .agg(count(lit(1)).as("n_media"),
          sum(when(col("bmp_meta.ok"), 1L).otherwise(0L)).as("n_ok"),
          sum(col("bmp_meta.width").cast("long")).as("sum_w"),
          sum(col("bmp_meta.height").cast("long")).as("sum_h"),
          sum(col("pixel_sum")).as("sum_pixels"))
    }),

    // REAL-codec video pipeline (r13): seeded uncompressed AVIs (RIFF /
    // LIST hdrl / avih / LIST movi / '00db' raw bottom-up BGR frames)
    // decoded by the real two-level chunk walk + per-frame padded-stride
    // pixel walk — the video column of the multimodal north star, all
    // integer so the DuckDB twin replays decode(encode(seed)) exactly
    "q_avi_decode" -> ((s, d) => {
      val aviUdf = udf((seed: Long) => Codecs.synthAviNear(seed, 0))
      val media = fanned(Tables.documents(s, d).filter(col("doc_id") < 300))
        .select(col("doc_id").as("media_id"), aviUdf(col("doc_id")).as("payload"))
      Multimodal.decodeAviMeta(media)
        .groupBy(col("avi_meta.n_frames").cast("long").as("n_frames"))
        .agg(count(lit(1)).as("n_media"),
          sum(when(col("avi_meta.ok"), 1L).otherwise(0L)).as("n_ok"),
          sum(col("avi_meta.us_per_frame")).as("sum_us"),
          sum(col("pixel_sum")).as("sum_pixels"))
        .orderBy("n_frames")
    }),

    // VIDEO NEAR-DUP (r13): keyframe dHash over the decoded first frame
    // ([[graft.ops.Codecs.aviKeyframeDHash]] — the thumbnail near-dup
    // technique) through the same Hamming-banded machinery as text
    // SimHash, image dHash, and audio energy. Corpus: one synthetic AVI
    // per document row (r14: scales with the table) in planted pairs —
    // (2i, 2i+1) share seed i, the odd sibling has one pixel of frame 0
    // perturbed (≤ 1 bit flips); seeds offset by 500000 so the
    // keyframes are NOT the q_image_phash bitmaps.
    "q_video_phash" -> ((s, d) => {
      val aviUdf = udf((id: Long) =>
        Codecs.synthAviNear(id / 2 + 500000L, (id % 2).toInt * 128))
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), aviUdf(col("doc_id")).as("payload"))
      Dedup.hammingNearDup(Multimodal.videoKeyframeDHash(media),
        prefixBits = 16, maxHamming = 3, bands = 4)
    }),

    // AUDIO NEAR-DUP (r13): energy-comparison fingerprint over real
    // decoded PCM ([[graft.ops.Codecs.wavFingerprint]] — RIFF chunk
    // walk, 16-bit LE decode, 65-window exact integer energies, 64
    // neighbor comparisons) through the SAME Hamming-banded machinery
    // as text SimHash and image dHash (`Dedup.hammingNearDup`). Corpus:
    // one synthetic WAV per document row (r14: scales with the table)
    // in planted pairs — (2i, 2i+1) share seed i, the odd sibling has
    // ONE sample perturbed (flips at most bit 0).
    "q_audio_fp" -> ((s, d) => {
      val wavUdf = udf((id: Long) => Codecs.synthWavNear(id / 2, (id % 2).toInt * 1024))
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), wavUdf(col("doc_id")).as("payload"))
      Dedup.hammingNearDup(Multimodal.audioFingerprint(media),
        prefixBits = 16, maxHamming = 3, bands = 4)
    }),

    // CROSS-MODAL near-dup (r14): which IMAGES appear as VIDEO keyframes
    // — thumbnail-reuse detection, the cross-modality cell of the dedup
    // north star. Two DIFFERENT codec chains (BMP header/stride decode →
    // dHash; AVI two-level RIFF walk → keyframe dHash) meet in ONE
    // banded-Hamming join ([[graft.ops.Dedup.hammingNearDupAcross]] —
    // no self-join id ordering, distinct id spaces). Planted: every
    // doc_id % 3 == 0 video reuses image doc_id's pixels as frame 0
    // (odd ids with a 1-pixel edit → ≤ 1 flipped bit); all other videos
    // draw from a disjoint seed range [500000, 700000) and must not
    // match (image seeds stay < 500000 through sf10).
    "q_crossmodal_dup" -> ((s, d) => {
      val bmpUdf = udf((id: Long) => Codecs.synthBmpNear(id, 0))
      val aviUdf = udf((id: Long) => Codecs.synthAviNear(
        if (id % 3 == 0) id else 500000L + id % 200000L, (id % 2).toInt * 128))
      val docs = fanned(Tables.documents(s, d))
      val images = docs
        .select(col("doc_id").as("media_id"), bmpUdf(col("doc_id")).as("payload"))
      val videos = docs
        .select(col("doc_id").as("media_id"), aviUdf(col("doc_id")).as("payload"))
      Dedup.hammingNearDupAcross(
        Multimodal.imageDHash(images),
        Multimodal.videoKeyframeDHash(videos),
        prefixBits = 16, maxHamming = 3, bands = 4)
    }),

    // MULTI-FRAME cross-modal near-dup (r15): q_crossmodal_dup bands
    // frame 0 only — a still reused DEEPER in a video is invisible to
    // it. Here every decoded frame gets a dHash
    // ([[graft.ops.Multimodal.videoFrameDHashes]] — one container walk
    // per video, one signature row per frame) and the SAME
    // hammingNearDupAcross engine bands (media, frame) signatures
    // against the image corpus; the signature id is a
    // struct(media_id, frame_idx), unpacked in the output. Planted:
    // doc_id % 3 == 0 videos embed image doc_id's exact pixel plane at
    // frame (doc_id/3) mod nFrames ([[graft.ops.Codecs.synthAviNearAt]]
    // — all OTHER frames use a shifted plane that matches no image);
    // odd ids carry the 1-pixel edit (≤ 1 flipped bit). Other videos
    // draw from the disjoint [500000, 700000) seed range.
    "q_crossmodal_frames" -> ((s, d) => {
      val bmpUdf = udf((id: Long) => Codecs.synthBmpNear(id, 0))
      val aviUdf = udf((id: Long) => Codecs.synthAviNearAt(
        if (id % 3 == 0) id else 500000L + id % 200000L,
        (id % 2).toInt * 128, ((id / 3) % 8).toInt))
      val docs = fanned(Tables.documents(s, d))
      val images = docs
        .select(col("doc_id").as("media_id"), bmpUdf(col("doc_id")).as("payload"))
      val videos = docs
        .select(col("doc_id").as("media_id"), aviUdf(col("doc_id")).as("payload"))
      val frameSigs = Multimodal.videoFrameDHashes(videos)
        .select(struct(col("id").as("media_id"), col("frame_idx")).as("id"),
          col("sig"))
      Dedup.hammingNearDupAcross(
        Multimodal.imageDHash(images), frameSigs,
        prefixBits = 16, maxHamming = 3, bands = 4)
        .select(col("id_a"), col("id_b.media_id").as("vid_id"),
          col("id_b.frame_idx").as("frame_idx"), col("hamming"))
    }),

    "q_multimodal_frames" -> ((s, d) => {
      val media = fanned(Tables.documents(s, d).filter(col("doc_id") < 200))
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"), col("source").as("mime"))
      val feats = Multimodal.extractFeatures(
        Multimodal.sampleFrames(Multimodal.decodeMeta(media), n = 4), dim = 8)
      feats.groupBy("mime")
        .agg(count(lit(1)).as("n_frames"),
          count_distinct(col("media_id")).as("n_media"),
          min(size(col("features"))).as("dim"))
    })
  )

  /** The q_sim_lsh hyperplane sign matrix (splitmix64-derived,
    * driver-side — same code path the codegen kernel embeds) rendered as
    * DuckDB VALUES rows `(table, bit, ±1.0-list)`, so the oracle replays
    * the exact sign-flip folds: list_dot_product(v, ±1-list) performs the
    * identical in-order sequence of adds as the kernel's `acc += ±x`. */
  // the corpus predicate parameterizes the retraction twin (q_sim_ivf_
  // tombstone): restricting cc to the survivors IS probing an index
  // whose deleted ids are the predicate's complement
  private lazy val ivfTopKOracleSql: String = ivfTopKOracle("TRUE")
  private def ivfTopKOracle(corpusPred: String): String =
    s"""WITH e AS (
      | SELECT vec_id, unnest(embedding) AS x,
      |        generate_subscripts(embedding, 1) - 1 AS i
      | FROM embeddings),
      |rk AS (
      | SELECT vec_id, i*2 + CASE WHEN x >= 0 THEN 0 ELSE 1 END AS cell,
      |        row_number() OVER (PARTITION BY vec_id ORDER BY abs(x) DESC, i) AS rn
      | FROM e WHERE i < 16),
      |cc AS (SELECT vec_id AS n_id, cell FROM rk
      |       WHERE rn = 1 AND $corpusPred),
      |qc AS (SELECT DISTINCT vec_id AS q_id, cell FROM rk
      |       WHERE rn <= 6 AND vec_id < 10),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
      |cand AS (SELECT DISTINCT q_id, n_id
      |         FROM qc JOIN cc USING (cell) WHERE q_id <> n_id),
      |s AS (SELECT q_id, n_id,
      |  list_dot_product(qv.vd, nv.vd)
      |   / (sqrt(list_dot_product(qv.vd, qv.vd))
      |      * sqrt(list_dot_product(nv.vd, nv.vd))) AS sim
      | FROM cand JOIN v qv ON cand.q_id = qv.vec_id
      |           JOIN v nv ON cand.n_id = nv.vec_id),
      |r AS (SELECT q_id, n_id, sim,
      |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rnk FROM s)
      |SELECT q_id, rnk, n_id, round(sim, 4) AS sim FROM r WHERE rnk <= 5""".stripMargin

  // shared by q_bm25_search and q_bm25_persisted — the persisted-index
  // probe is multiset-identical to the direct scorer by construction.
  // The corpus predicate parameterizes the tombstone twin: scoring over
  // `documents WHERE pred` IS the oracle for a probe against an index
  // whose deleted docs are exactly the predicate's complement (stats
  // retraction included — n_docs and avgdl come from the filtered set).
  private lazy val bm25OracleSql: String = bm25Oracle("TRUE")
  private def bm25Oracle(pred: String): String =
    s"""WITH d AS (SELECT doc_id, $sqlToks AS toks FROM documents
       |           WHERE $pred),
       |tfc AS (
       |  SELECT doc_id, term, count(*)::DOUBLE AS cnt
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM d)
       |  WHERE term IN ('spark', 'merge', 'window')
       |  GROUP BY doc_id, term),
       |dls AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM d),
       |stats AS (SELECT count(*)::DOUBLE AS n_docs,
       |  avg(len(toks))::DOUBLE AS avgdl FROM d),
       |dft AS (SELECT term, count(*) AS df_t FROM tfc GROUP BY term)
       |SELECT tfc.doc_id AS doc_id, count(*) AS n_terms,
       |  round(sum(ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5)) *
       |    cnt * (1.2 + 1) /
       |    (cnt + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 2) AS score_r
       |FROM tfc JOIN dft USING (term) JOIN dls USING (doc_id)
       |  CROSS JOIN stats
       |GROUP BY tfc.doc_id""".stripMargin

  private lazy val lshTopKOracleSql: String = lshTopKOracle("TRUE")

  /** [[lshTopKOracleSql]] with a corpus-side predicate (over embeddings
    * columns) — `TRUE` is the unfiltered search, anything else is the
    * filtered-vector-search twin: the predicate restricts which vectors
    * may appear as neighbors, exactly like the probe's pre-filter. */
  private def lshTopKOracle(corpusPred: String): String =
    s"""WITH sgn(t, b, s) AS (VALUES ${lshSignRows(6, 4, 64, 42L)}),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
       |acc AS (SELECT vec_id, t, b, list_dot_product(vd, s::DOUBLE[]) AS a
       |        FROM v CROSS JOIN sgn),
       |sig AS (SELECT vec_id, t,
       |  sum(CASE WHEN a >= 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sg
       | FROM acc GROUP BY vec_id, t),
       |cb AS (SELECT s.vec_id AS n_id, t*64 + sg AS bucket FROM sig s
       |       JOIN embeddings e2 ON s.vec_id = e2.vec_id
       |       WHERE $corpusPred),
       |qb AS (SELECT DISTINCT vec_id AS q_id, t*64 + xor(sg, p::BIGINT) AS bucket
       |       FROM sig CROSS JOIN (VALUES (0), (1), (2)) pr(p)
       |       WHERE vec_id < 10),
       |cand AS (SELECT DISTINCT q_id, n_id
       |         FROM qb JOIN cb USING (bucket) WHERE q_id <> n_id),
       |s2 AS (SELECT q_id, n_id,
       |  list_dot_product(qv.vd, nv.vd)
       |   / (sqrt(list_dot_product(qv.vd, qv.vd))
       |      * sqrt(list_dot_product(nv.vd, nv.vd))) AS sim
       | FROM cand JOIN v qv ON cand.q_id = qv.vec_id
       |           JOIN v nv ON cand.n_id = nv.vec_id),
       |r AS (SELECT q_id, n_id, sim,
       |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rnk FROM s2)
       |SELECT q_id, rnk, n_id, round(sim, 4) AS sim FROM r WHERE rnk <= 5""".stripMargin

  private def lshSignRows(bits: Int, tables: Int, dim: Int, seed: Long): String = {
    import graft.functions.HyperplaneSignature.{signMatrix, MaxDim}
    (for (t <- 0 until tables; b <- 0 until bits) yield {
      val m = signMatrix(bits, seed + t)
      val lst = (0 until dim)
        .map(j => if (m(b * MaxDim + j)) "1.0" else "-1.0")
        .mkString("[", ",", "]")
      s"($t, $b, $lst)"
    }).mkString(", ")
  }

  /** The q_random_proj ±1 sign rows (same splitmix64 derivation as
    * [[lshSignRows]], one row per OUTPUT dim) as DuckDB VALUES, so the
    * oracle's list_dot_product replays the kernel's in-order adds. */
  private def rpSignRows(dOut: Int, dim: Int, seed: Long): String = {
    import graft.functions.HyperplaneSignature.{signMatrix, MaxDim}
    val m = signMatrix(dOut, seed)
    (0 until dOut).map { k =>
      val lst = (0 until dim)
        .map(j => if (m(k * MaxDim + j)) "1.0" else "-1.0")
        .mkString("[", ",", "]")
      s"($k, $lst)"
    }.mkString(", ")
  }

  /** Unrolled BPE merge training ([[graft.ops.Curation.bpeTrainMerges]])
    * as a DuckDB WITH-chain: per round, split the double-space corpus
    * string, count adjacent pairs, argmax with (n desc, a, b) tie-break,
    * literal-replace rewrite. Produces `top1..topN`. */
  private def bpeSqlChain(steps: Int): String = {
    val sb = new StringBuilder(
      s"""t0 AS (SELECT lang,
         |   '  ' || array_to_string($sqlToks, '  ') || '  ' AS s
         |  FROM documents)""".stripMargin)
    for (k <- 1 to steps) {
      sb.append(s""",
        |tk$k AS (SELECT list_filter(string_split(s, '  '), x -> x <> '')
        |   AS t FROM t${k - 1}),
        |p$k AS (SELECT p.a AS a, p.b AS b, count(*) AS n FROM (
        |   SELECT unnest(list_transform(range(1, len(t)),
        |     i -> struct_pack(a := t[i], b := t[i+1]))) AS p
        |   FROM tk$k WHERE len(t) >= 2)
        |  GROUP BY 1, 2),
        |top$k AS (SELECT a, b, n FROM p$k ORDER BY n DESC, a, b LIMIT 1),
        |t$k AS (SELECT lang, replace(s, ' ' || a || '  ' || b || ' ',
        |    ' ' || a || '~' || b || ' ') AS s
        |  FROM t${k - 1} CROSS JOIN top$k)""".stripMargin)
    }
    sb.toString
  }

  /** Unrolled Lloyd's k-means as a DuckDB WITH-chain (no trailing
    * SELECT): replays [[graft.ops.Similarity.kmeans]] step for step —
    * md5-rank init, per-iteration argmax-dot assignment (ties to the
    * lower cluster), per-(cluster,pos) mean update with empty clusters
    * keeping their previous centroid, and one final assignment `af`
    * under the last centroids. Cosine mode (pre-normalized vectors).
    * Expects a `nv(vec_id, nv)` CTE upstream. */
  private def kmeansSqlChain(k: Int, iters: Int): String = {
    val sb = new StringBuilder(
      s"""c0 AS (SELECT cluster, nv AS cv FROM (
         |    SELECT nv, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cluster
         |    FROM nv) WHERE cluster < $k)""".stripMargin)
    var prev = "c0"
    for (i <- 1 to iters) {
      sb.append(s""",
        |a$i AS (SELECT vec_id, nv, cluster FROM (
        |    SELECT vec_id, nv, cluster,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cluster) AS rn
        |    FROM (SELECT n.vec_id, n.nv, c.cluster, list_dot_product(n.nv, c.cv) AS s
        |          FROM nv n CROSS JOIN $prev c)) WHERE rn = 1),
        |c$i AS (SELECT p.cluster, COALESCE(nl.cv, p.cv) AS cv
        |  FROM $prev p LEFT JOIN (
        |    SELECT cluster, list(m ORDER BY pos) AS cv FROM (
        |      SELECT cluster, pos, avg(x) AS m FROM (
        |        SELECT cluster, unnest(nv) AS x, generate_subscripts(nv, 1) AS pos FROM a$i)
        |      GROUP BY cluster, pos) GROUP BY cluster) nl
        |  ON p.cluster = nl.cluster)""".stripMargin)
      prev = s"c$i"
    }
    sb.append(s""",
      |af AS (SELECT vec_id, nv, cluster FROM (
      |    SELECT vec_id, nv, cluster,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cluster) AS rn
      |    FROM (SELECT n.vec_id, n.nv, c.cluster, list_dot_product(n.nv, c.cv) AS s
      |          FROM nv n CROSS JOIN $prev c)) WHERE rn = 1)""".stripMargin)
    sb.toString
  }

  /** The normalization prefix [[kmeansSqlChain]] expects. */
  private val kmeansNvPrefix: String =
    """v AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
      |nrm AS (SELECT vec_id, vd, sqrt(list_dot_product(vd, vd)) AS nr FROM v),
      |nv AS (SELECT vec_id,
      |    CASE WHEN nr = 0 THEN vd ELSE list_transform(vd, x -> x / nr) END AS nv
      |  FROM nrm)""".stripMargin

  /** Product-quantization training/encode as a DuckDB WITH-chain: one
    * raw-L2 [[kmeansSqlChain]]-shaped loop per subspace (argmax of
    * dot − |c|²/2 — identical add sequence to the Scala fold since
    * list_dot_product(cv,cv) replays c.map(x*x).sum), codebooks taken
    * from the FINAL assignment's fresh per-cluster means and
    * dense-ranked by cluster id (empty clusters drop out — PQ codes
    * index the codeword LIST), then per-vector argmin-L2 codes.
    * Produces `sv{s}`, `cb{s}(ci, cv)`, `code{s}(vec_id, ci)` per
    * subspace. Expects `v(vec_id, vd, label)` upstream. */
  private def pqSqlChain(m: Int, k: Int, sub: Int, iters: Int): String =
    (0 until m).map { s =>
      val lo = s * sub + 1; val hi = s * sub + sub
      val sb = new StringBuilder(
        s"""sv$s AS (SELECT vec_id, vd[$lo:$hi] AS sub FROM v),
           |i${s}c0 AS (SELECT cluster, sub AS cv FROM (
           |    SELECT sub, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cluster
           |    FROM sv$s) WHERE cluster < $k)""".stripMargin)
      var prev = s"i${s}c0"
      val assign = (alias: String, src: String) =>
        s"""$alias AS (SELECT vec_id, sub, cluster FROM (
           |    SELECT vec_id, sub, cluster,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, cluster) AS rn
           |    FROM (SELECT n.vec_id, n.sub, c.cluster,
           |            list_dot_product(n.sub, c.cv) - list_dot_product(c.cv, c.cv)/2 AS sc
           |          FROM sv$s n CROSS JOIN $src c)) WHERE rn = 1)""".stripMargin
      for (i <- 1 to iters) {
        sb.append(",\n").append(assign(s"i${s}a$i", prev))
        sb.append(s""",
          |i${s}c$i AS (SELECT p.cluster, COALESCE(nl.cv, p.cv) AS cv
          |  FROM $prev p LEFT JOIN (
          |    SELECT cluster, list(m ORDER BY pos) AS cv FROM (
          |      SELECT cluster, pos, avg(x) AS m FROM (
          |        SELECT cluster, unnest(sub) AS x, generate_subscripts(sub,1) AS pos FROM i${s}a$i)
          |      GROUP BY cluster, pos) GROUP BY cluster) nl
          |  ON p.cluster = nl.cluster)""".stripMargin)
        prev = s"i${s}c$i"
      }
      sb.append(",\n").append(assign(s"i${s}af", prev))
      sb.append(s""",
        |cb$s AS (SELECT row_number() OVER (ORDER BY cluster) - 1 AS ci, cv FROM (
        |    SELECT cluster, list(m ORDER BY pos) AS cv FROM (
        |      SELECT cluster, pos, avg(x) AS m FROM (
        |        SELECT cluster, unnest(sub) AS x, generate_subscripts(sub,1) AS pos FROM i${s}af)
        |      GROUP BY cluster, pos) GROUP BY cluster)),
        |code$s AS (SELECT vec_id, ci FROM (
        |    SELECT n.vec_id, c.ci,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        list_dot_product(n.sub, c.cv) - list_dot_product(c.cv, c.cv)/2 DESC, c.ci) AS rn
        |    FROM sv$s n CROSS JOIN cb$s c) WHERE rn = 1)""".stripMargin)
      sb.toString
    }.mkString(",\n")

  /** The exact squared-L2 fold between two DuckDB lists, replaying the
    * engine's left-to-right `0.0 + (x−y)² + …` accumulation (the
    * [[graft.functions.ArrayL2Sq]] kernel / its HOF twin) — list_reduce
    * with a prepended 0.0 init, per the list_reduce accumulator rule. */
  private def l2FoldSql(a: String, b: String, n: Int): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${n + 1}),
       |      i -> ($a[i::INT] - $b[i::INT]) * ($a[i::INT] - $b[i::INT]))),
       |      (acc, x) -> acc + x)""".stripMargin

  /** Unrolled COARSE raw-L2 k-means over the full vector
    * `srcTbl(vec_id, vd)` — the IVFADC coarse quantizer, same idiom as
    * [[pqSqlChain]]'s per-subspace loop (argmax of dot − |c|²/2, ties to
    * the lower cluster; empty clusters keep their previous centroid).
    * Produces `gc{iters}` (final centroids, cluster ids preserved) and
    * `gaf` (final assignment of every corpus vector). */
  private def coarseL2SqlChain(k: Int, iters: Int,
      srcTbl: String = "v"): String = {
    val sb = new StringBuilder(
      s"""gc0 AS (SELECT cluster, vd AS cv FROM (
         |    SELECT vd, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cluster
         |    FROM $srcTbl) WHERE cluster < $k)""".stripMargin)
    var prev = "gc0"
    val assign = (alias: String, src: String) =>
      s"""$alias AS (SELECT vec_id, vd, cluster FROM (
         |    SELECT vec_id, vd, cluster,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, cluster) AS rn
         |    FROM (SELECT n.vec_id, n.vd, c.cluster,
         |            list_dot_product(n.vd, c.cv) - list_dot_product(c.cv, c.cv)/2 AS sc
         |          FROM $srcTbl n CROSS JOIN $src c)) WHERE rn = 1)""".stripMargin
    for (i <- 1 to iters) {
      sb.append(",\n").append(assign(s"ga$i", prev))
      sb.append(s""",
        |gc$i AS (SELECT p.cluster, COALESCE(nl.cv, p.cv) AS cv
        |  FROM $prev p LEFT JOIN (
        |    SELECT cluster, list(m ORDER BY pos) AS cv FROM (
        |      SELECT cluster, pos, avg(x) AS m FROM (
        |        SELECT cluster, unnest(vd) AS x, generate_subscripts(vd,1) AS pos FROM ga$i)
        |      GROUP BY cluster, pos) GROUP BY cluster) nl
        |  ON p.cluster = nl.cluster)""".stripMargin)
      prev = s"gc$i"
    }
    sb.append(",\n").append(assign("gaf", prev))
    sb.toString
  }

  /** XXH64 (Spark's xxhash64, seed 42) replayed in DuckDB SQL for the
    * short-input path (len ≤ 31 bytes — covers this corpus's whole token
    * alphabet with 4× headroom; ≥ 32 bytes would need the 4-accumulator
    * stripe loop). 64-bit wrapping arithmetic is emulated in HUGEINT:
    * multiplication splits into 32-bit limbs so no intermediate exceeds
    * 2^96, xor round-trips through signed BIGINT, and rotl(h,r) =
    * (h·2^r mod 2^64) + h div 2^(64−r). Validated bit-equal against
    * Spark's xxhash64 on the corpus vocabulary (r9). */
  private object Xxh64Sql {
    private val M = "18446744073709551616"
    private val Hf = "9223372036854775808"
    private val P1 = "11400714785074694791::HUGEINT"
    private val P2 = "14029467366897019727::HUGEINT"
    private val P3 = "1609587929392839161::HUGEINT"
    private val P4 = "9650029242287828579::HUGEINT"
    private val P5 = "2870177450012600261::HUGEINT"
    private def mul64(a: String, b: String) =
      s"((($a)%4294967296*(($b)%4294967296)" +
        s"+((($a)//4294967296*(($b)%4294967296)+($a)%4294967296*(($b)//4294967296))%4294967296)*4294967296)%$M::HUGEINT)"
    private def xor64(a: String, b: String) =
      s"((xor(CAST(CASE WHEN ($a)>=$Hf THEN ($a)-$M ELSE ($a) END AS BIGINT)," +
        s"CAST(CASE WHEN ($b)>=$Hf THEN ($b)-$M ELSE ($b) END AS BIGINT))::HUGEINT+$M)%$M)"
    def rotl(h: String, r: Int) =
      s"((($h)*${1L << r})%$M+($h)//${1L << (64 - r)})"
    def toSigned(u: String) =
      s"CAST(CASE WHEN ($u)>=$Hf THEN ($u)-$M ELSE ($u) END AS BIGINT)"
    private def byteAt(i: String) =
      s"(ord(substr(t, ($i)::INT, 1))::HUGEINT)"
    // little-endian word of 8 (or 4) bytes starting at 1-based offset o,
    // guarded so substr is never evaluated past the string
    private def word(o: Int, n: Int) = (0 until n).map { j =>
      s"(CASE WHEN len >= ${o + j} THEN ord(substr(t,${o + j},1))::HUGEINT ELSE 0::HUGEINT END)*${BigInt(256).pow(j)}"
    }.mkString("(", "+", ")")
    private def wordRound(h: String, w: String) =
      s"(${mul64(rotl(xor64(h, mul64(rotl(mul64(w, P2), 31), P1)), 27), P1)} + $P4) % $M"
    private def intRound(h: String, w: String) =
      s"(${mul64(rotl(xor64(h, mul64(w, P1)), 23), P2)} + $P3) % $M"
    private def byteRound(h: String, b: String) =
      mul64(rotl(xor64(h, mul64(b, P5)), 11), P1)

    /** CTE chain computing `h` (HUGEINT in [0,2^64)) per row of an
      * upstream `tl(t, len)` relation; final alias `hf`. */
    def chain: String = {
      val sb = new StringBuilder
      sb.append(s"""hs0 AS MATERIALIZED (SELECT t, len,
        |  ((42::HUGEINT + $P5 + len::HUGEINT) % $M) AS h FROM tl)""".stripMargin)
      // up to three full 8-byte words (len <= 31 short-input path)
      for (k <- 0 until 3) {
        sb.append(s""",
          |hw${k + 1} AS MATERIALIZED (SELECT t, len,
          |  CASE WHEN len >= ${8 * (k + 1)} THEN ${wordRound("h", word(8 * k + 1, 8))}
          |  ELSE h END AS h FROM hw$k)""".stripMargin
          .replace("hw0", "hs0"))
      }
      // optional 4-byte word after the full words
      sb.append(s""",
        |h4 AS MATERIALIZED (SELECT t, len, (len//8)*8 AS woff,
        |  CASE WHEN len % 8 >= 4 THEN ${intRound("h", "w4")}
        |  ELSE h END AS h FROM (
        |    SELECT t, len, h, ${word4Dyn} AS w4 FROM hw3))""".stripMargin)
      // up to three trailing bytes
      sb.append(s""",
        |hb0 AS MATERIALIZED (SELECT t, len, (len//8)*8 + CASE WHEN len % 8 >= 4 THEN 4 ELSE 0 END AS bstart, h FROM h4)""".stripMargin)
      for (k <- 1 to 3) {
        sb.append(s""",
          |hb$k AS MATERIALIZED (SELECT t, len, bstart,
          |  CASE WHEN bstart+$k <= len THEN ${byteRound("h", byteAt(s"bstart+$k"))}
          |  ELSE h END AS h FROM hb${k - 1})""".stripMargin)
      }
      sb.append(s""",
        |hf0 AS MATERIALIZED (SELECT t, ${mul64(xor64("h", "h//8589934592"), P2)} AS h FROM hb3),
        |hf1 AS MATERIALIZED (SELECT t, ${mul64(xor64("h", "h//536870912"), P3)} AS h FROM hf0),
        |hf AS MATERIALIZED (SELECT t, ${xor64("h", "h//4294967296")} AS h FROM hf1)""".stripMargin)
      sb.toString
    }
    // 4-byte little-endian word at dynamic offset (len//8)*8 + 1
    private def word4Dyn = (0 until 4).map { j =>
      s"(CASE WHEN len >= (len//8)*8 + ${j + 1} AND len % 8 >= 4 THEN ord(substr(t, ((len//8)*8 + ${j + 1})::INT, 1))::HUGEINT ELSE 0::HUGEINT END)*${BigInt(256).pow(j)}"
    }.mkString("(", "+", ")")
  }

  private val oracleBase: Map[String, String] = Map(
    "q_text_stats" ->
      s"""SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars,
         | sum(len($sqlToks))::BIGINT AS n_tokens
         |FROM documents GROUP BY lang""".stripMargin,

    "q_text_tokens" ->
      s"""SELECT lang, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct,
         | min(tok) AS first_tok
         |FROM (SELECT lang, unnest($sqlToks) AS tok FROM documents)
         |GROUP BY lang""".stripMargin,

    "q_readability" ->
      """WITH w AS (SELECT lang,
        |  len(regexp_extract_all(text, '[A-Za-z]+'))::DOUBLE AS words,
        |  len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE AS vg
        | FROM documents)
        |SELECT lang, count(*) AS n_docs,
        | round(avg(206.835 - 1.015 * words - 84.6 * (vg / words)), 2)
        |   AS avg_score
        |FROM w WHERE words > 0 GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_quality" ->
      s"""WITH t AS (SELECT lang, $sqlToks AS toks FROM documents)
         |SELECT lang,
         | round(sum(CASE WHEN len(toks)=0 THEN 0 ELSE
         |  len(list_filter(toks, x -> x IN ('the','a','of','and')))::DOUBLE
         |   / len(toks)::DOUBLE END), 2) AS sum_sw_ratio,
         | round(sum(CASE WHEN len(toks)=0 THEN 0 ELSE
         |  list_sum(list_transform(toks, x -> length(x)))::DOUBLE
         |   / len(toks)::DOUBLE END), 2) AS sum_mean_len,
         | count(*) AS n
         |FROM t GROUP BY lang""".stripMargin,

    "q_tfidf_keywords" ->
      s"""WITH tfc AS (
         |  SELECT doc_id, term, count(*) AS cnt FROM (
         |    SELECT doc_id, unnest($sqlToks) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |dft AS (SELECT term, count(*) AS df_t FROM tfc GROUP BY term),
         |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, tfc.term AS term,
         |    cnt * ln(n_docs / df_t) AS tfidf
         |  FROM tfc JOIN dft USING (term) CROSS JOIN n),
         |ranked AS (
         |  SELECT doc_id, term, tfidf, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
         |  FROM scored)
         |SELECT doc_id, rnk, term, round(tfidf, 2) AS score_r
         |FROM ranked WHERE rnk <= 5 AND doc_id < 50""".stripMargin,

    "q_bm25_search" -> bm25OracleSql,

    // the persisted-index probe returns the identical multiset (df_t
    // re-derived from matched postings; N/avgdl from exact integer
    // stats totals) — the direct-scorer oracle IS its oracle
    "q_bm25_persisted" -> bm25OracleSql,

    // build ∪ append − delete ≡ the direct scorer over the survivors:
    // the WHERE lands in the stats CTEs too, so a stats-retraction bug
    // (avgdl still skewed by deleted docs) diverges every score hash
    "q_bm25_tombstone" -> bm25Oracle("doc_id % 5 <> 0"),

    // transposed probe: tf/dl from the INCOMING batch (doc_id < 60),
    // df_t/N/avgdl from the FULL indexed corpus — the split that makes
    // it the batch twin of scoring-at-ingest. dft joins LEFT with
    // COALESCE(df_t, 0): the engine scores a query term absent from the
    // corpus with the df_t=0 idf and counts it in n_terms, so the
    // oracle must encode that contract rather than silently rely on
    // every fixture term existing at every SF (an inner join would
    // hash-diverge confusingly if one ever vanished)
    "q_bm25_score" ->
      s"""WITH d AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |inc AS (SELECT doc_id, toks FROM d WHERE doc_id < 60),
         |tfc AS (
         |  SELECT doc_id, term, count(*)::DOUBLE AS cnt
         |  FROM (SELECT doc_id, unnest(toks) AS term FROM inc)
         |  WHERE term IN ('spark', 'merge', 'window')
         |  GROUP BY doc_id, term),
         |dls AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM inc),
         |stats AS (SELECT count(*)::DOUBLE AS n_docs,
         |  avg(len(toks))::DOUBLE AS avgdl FROM d),
         |dft AS (SELECT term, count(*)::DOUBLE AS df_t FROM (
         |  SELECT DISTINCT doc_id, term
         |  FROM (SELECT doc_id, unnest(toks) AS term FROM d)
         |  WHERE term IN ('spark', 'merge', 'window'))
         | GROUP BY term)
         |SELECT tfc.doc_id AS doc_id, count(*) AS n_terms,
         |  round(sum(ln(1 + (n_docs - coalesce(df_t, 0) + 0.5)
         |      / (coalesce(df_t, 0) + 0.5)) *
         |    cnt * (1.2 + 1) /
         |    (cnt + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 2) AS score_r
         |FROM tfc LEFT JOIN dft USING (term) JOIN dls USING (doc_id)
         |  CROSS JOIN stats
         |GROUP BY tfc.doc_id""".stripMargin,

    // distinct doc trigrams restricted to the query's, counted per doc;
    // 9 = ceil(0.9 * 10 query trigrams) — integer threshold, no floats
    "q_fuzzy_match" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS dl FROM documents),
        |t AS (SELECT doc_id, substr(text, g.i, 3) AS tg
        |  FROM d, LATERAL (SELECT unnest(generate_series(1, dl - 2)) AS i) g
        |  WHERE dl >= 3),
        |dt AS (SELECT DISTINCT doc_id, tg FROM t
        |  WHERE tg IN (' wi','doz','e w','erg','ge ','ind','mer','ndo','rge','win'))
        |SELECT doc_id, count(*)::BIGINT AS n_matched FROM dt
        |GROUP BY doc_id HAVING count(*) >= 9""".stripMargin,

    // the index is exact by construction (necessary-condition pruning +
    // contains verify) — the oracle is the plain substring scan
    "q_substr_search" ->
      """SELECT doc_id FROM documents
        |WHERE instr(text, 'merge window') > 0""".stripMargin,

    // build ∪ append − delete ≡ the substring scan over the survivors
    "q_substr_tombstone" ->
      """SELECT doc_id FROM documents
        |WHERE instr(text, 'merge window') > 0 AND doc_id % 4 <> 0""".stripMargin,

    "q_frequent_phrases" ->
      s"""WITH d AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |g AS (SELECT doc_id, array_to_string(toks[g.i : g.i + 2], ' ') AS phrase
         |  FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) g
         |  WHERE len(toks) >= 3),
         |c AS (SELECT phrase, count(*) AS n_occ,
         |  count(DISTINCT doc_id) AS n_docs FROM g GROUP BY phrase)
         |SELECT phrase, n_occ::BIGINT AS n_occ, n_docs::BIGINT AS n_docs
         |FROM c ORDER BY n_occ DESC, phrase LIMIT 20""".stripMargin,

    "q_doc_freq" ->
      s"""SELECT term, count(*) AS df_t FROM (
         |  SELECT doc_id, term FROM (
         |    SELECT doc_id, unnest($sqlToks) AS term FROM documents)
         |  GROUP BY doc_id, term)
         |GROUP BY term ORDER BY df_t DESC, term LIMIT 20""".stripMargin,

    "q_approx_topk" ->
      """SELECT event_type AS item, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, item LIMIT 5""".stripMargin,

    // approx_ok is Spark-side-verified (|approx - exact| <= 10% of exact);
    // the oracle pins the contract as a literal, not the estimate itself.
    "q_approx_hll" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_u,
        | TRUE AS approx_ok, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q_hll_merge" ->
      """SELECT count(DISTINCT user_id) AS exact_m, TRUE AS approx_ok,
        | count(*) AS n_events, count(DISTINCT ts::DATE) AS n_days
        |FROM events""".stripMargin,

    "q_quality_lm" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($sqlToks) AS t FROM documents),
         |f AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
         |tot AS (SELECT count(*)::DOUBLE AS n FROM tok),
         |sc AS (SELECT doc_id, lang, sum(ln(c / n)) / count(*) AS lp
         |  FROM tok JOIN f USING (t) CROSS JOIN tot
         |  GROUP BY doc_id, lang)
         |SELECT lang, round(sum(lp), 2) AS sum_lp, count(*) AS n
         |FROM sc GROUP BY lang""".stripMargin,

    // same md5-prefix split threshold ('cccc' = 0.8 * 65536 in hex) and
    // 12-token-prefix fingerprint as the Spark side
    "q_split_leakage" ->
      """WITH s AS (SELECT
        |  md5(array_to_string((string_split_regex(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |    ' '))[1:12], ' ')) AS fp,
        |  CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4) < 'cccc'
        |       THEN 'train' ELSE 'test' END AS split
        | FROM documents),
        |g AS (SELECT fp, count(DISTINCT split) AS n_splits,
        |  count(*) AS n_docs FROM s GROUP BY fp)
        |SELECT count(*)::BIGINT AS leaked_groups,
        | sum(n_docs)::BIGINT AS leaked_docs
        |FROM g WHERE n_splits > 1""".stripMargin,

    // counts on the pre-redaction text via regexp_extract_all length;
    // chained replace in the same most-specific-first order
    "q_pii_multi" ->
      """WITH t AS (SELECT lang,
        |  text || ' contact ' || source || '@example.' || lang
        |    || ' from 10.0.' || (doc_id % 256)::VARCHAR
        |    || '.' || (doc_id % 100)::VARCHAR
        |    || ' call +1 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
        |    || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
        |    || ' card 4111 1111 1111 '
        |    || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS txt
        | FROM documents),
        |r AS (SELECT lang, txt,
        |  len(regexp_extract_all(txt, '\b\d{4}(?:[ -]\d{4}){3}\b')) AS n_card,
        |  len(regexp_extract_all(txt, '\+?\d{1,2} \d{3}-\d{3}-\d{4}')) AS n_phone,
        |  len(regexp_extract_all(txt, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
        |  len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(txt,
        |    '\b\d{4}(?:[ -]\d{4}){3}\b', '[CARD]', 'g'),
        |    '\+?\d{1,2} \d{3}-\d{3}-\d{4}', '[PHONE]', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IPV4]', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g')
        |    AS red
        | FROM t)
        |SELECT lang, sum(n_card)::BIGINT AS cards,
        | sum(n_phone)::BIGINT AS phones, sum(n_ipv4)::BIGINT AS ips,
        | sum(n_email)::BIGINT AS emails,
        | sum(length(red))::BIGINT AS redacted_len,
        | count(DISTINCT md5(red)) AS n_distinct
        |FROM r GROUP BY lang""".stripMargin,

    // naive-by-construction twin: LEFT JOIN on the levenshtein predicate
    // itself (no blocking) — if the prefix/suffix blocking ever lost a
    // candidate, the counts would diverge here
    "q_fuzzy_link" ->
      """WITH dirty AS (
        | SELECT c_custkey AS src_key,
        |   substr(c_name, 1, (9 + c_custkey % 9)::INT)
        |   || substr(c_name, (11 + c_custkey % 9)::INT,
        |        (8 - c_custkey % 9)::INT) AS d_s
        | FROM customer WHERE c_custkey % 7 = 3),
        |per AS (
        | SELECT d.src_key, count(c.c_custkey) AS m,
        |   sum(CASE WHEN c.c_custkey = d.src_key THEN 1 ELSE 0 END) AS t
        | FROM dirty d LEFT JOIN customer c
        |   ON levenshtein(d.d_s, c.c_name) <= 1
        | GROUP BY d.src_key)
        |SELECT count(*)::BIGINT AS n_dirty,
        | sum(CASE WHEN m > 0 THEN 1 ELSE 0 END)::BIGINT AS n_linked,
        | sum(CASE WHEN m > 1 THEN 1 ELSE 0 END)::BIGINT AS n_ambiguous,
        | sum(m)::BIGINT AS n_pairs,
        | sum(t)::BIGINT AS n_true
        |FROM per""".stripMargin,

    "q_fuzzy_link2" ->
      """WITH del AS (
        | SELECT c_custkey AS src_key,
        |   substr(c_name, 1, (9 + c_custkey % 9)::INT)
        |   || substr(c_name, (11 + c_custkey % 9)::INT,
        |        (8 - c_custkey % 9)::INT) AS del_s
        | FROM customer WHERE c_custkey % 7 = 3),
        |dirty AS (
        | SELECT src_key,
        |   substr(del_s, 1, (2 + src_key % 5)::INT) || 'x'
        |   || substr(del_s, (4 + src_key % 5)::INT, length(del_s)) AS d_s
        | FROM del),
        |per AS (
        | SELECT d.src_key, count(c.c_custkey) AS m,
        |   sum(CASE WHEN c.c_custkey = d.src_key THEN 1 ELSE 0 END) AS t
        | FROM dirty d LEFT JOIN customer c
        |   ON levenshtein(d.d_s, c.c_name) <= 2
        | GROUP BY d.src_key)
        |SELECT count(*)::BIGINT AS n_dirty,
        | sum(CASE WHEN m > 0 THEN 1 ELSE 0 END)::BIGINT AS n_linked,
        | sum(CASE WHEN m > 1 THEN 1 ELSE 0 END)::BIGINT AS n_ambiguous,
        | sum(m)::BIGINT AS n_pairs,
        | sum(t)::BIGINT AS n_true
        |FROM per""".stripMargin,

    // q_fuzzy_link2's naive-join oracle with the withdrawn records
    // (c_custkey % 10 = 0) excluded FROM THE CATALOG SIDE of the join
    // (the dirty derivation still covers the full customer set) — the
    // exact-recall contract of probe(build ∪ append − delete)
    "q_fuzzy_link_tombstone" ->
      """WITH del AS (
        | SELECT c_custkey AS src_key,
        |   substr(c_name, 1, (9 + c_custkey % 9)::INT)
        |   || substr(c_name, (11 + c_custkey % 9)::INT,
        |        (8 - c_custkey % 9)::INT) AS del_s
        | FROM customer WHERE c_custkey % 7 = 3),
        |dirty AS (
        | SELECT src_key,
        |   substr(del_s, 1, (2 + src_key % 5)::INT) || 'x'
        |   || substr(del_s, (4 + src_key % 5)::INT, length(del_s)) AS d_s
        | FROM del),
        |live AS (SELECT c_custkey, c_name FROM customer
        | WHERE c_custkey % 10 <> 0),
        |per AS (
        | SELECT d.src_key, count(c.c_custkey) AS m,
        |   sum(CASE WHEN c.c_custkey = d.src_key THEN 1 ELSE 0 END) AS t
        | FROM dirty d LEFT JOIN live c
        |   ON levenshtein(d.d_s, c.c_name) <= 2
        | GROUP BY d.src_key)
        |SELECT count(*)::BIGINT AS n_dirty,
        | sum(CASE WHEN m > 0 THEN 1 ELSE 0 END)::BIGINT AS n_linked,
        | sum(CASE WHEN m > 1 THEN 1 ELSE 0 END)::BIGINT AS n_ambiguous,
        | sum(m)::BIGINT AS n_pairs,
        | sum(t)::BIGINT AS n_true
        |FROM per""".stripMargin,

    // non-overlapping replace count == AC every-occurrence count because
    // every pattern is border-free (checked in CurationSpec); `//` keeps
    // the division integral (DuckDB `/` is float division)
    "q_blocklist_match" ->
      """WITH p(pat) AS (VALUES ('big table'), ('dup'), ('fast scan'),
        |  ('scan'), ('slow merge'), ('slow query'), ('small batch'),
        |  ('sort merge'))
        |SELECT pat AS pattern,
        | sum(CASE WHEN contains(text, pat) THEN 1 ELSE 0 END)::BIGINT AS n_docs,
        | sum((length(text) - length(replace(text, pat, ''))) // length(pat))::BIGINT
        |   AS occurrences
        |FROM documents CROSS JOIN p
        |GROUP BY pat ORDER BY pat""".stripMargin,

    // twin of the sparse hits scan: same per-term replace counts over
    // the 48-term dictionary, rows for matched patterns only
    "q_blocklist_hits" ->
      s"""WITH p(pat) AS (VALUES ${blocklistHitsDict.map(p => s"('$p')").mkString(", ")})
         |SELECT pat AS pattern,
         | sum(CASE WHEN contains(text, pat) THEN 1 ELSE 0 END)::BIGINT AS n_docs,
         | sum((length(text) - length(replace(text, pat, ''))) // length(pat))::BIGINT
         |   AS occurrences
         |FROM documents CROSS JOIN p
         |GROUP BY pat
         |HAVING sum(CASE WHEN contains(text, pat) THEN 1 ELSE 0 END) > 0
         |ORDER BY pattern""".stripMargin,

    "q_sim_refine" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
         |q AS (SELECT vec_id AS q_id, vd AS qv FROM v WHERE vec_id < 10),
         |s AS (SELECT q_id, vec_id AS n_id, qv, vd AS nv,
         |  list_dot_product(qv, vd)
         |   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(vd, vd))) AS sim
         | FROM q CROSS JOIN v WHERE q_id <> vec_id),
         |cand AS (SELECT q_id, n_id, qv, nv FROM (
         |  SELECT q_id, n_id, qv, nv,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rc
         |  FROM s) WHERE rc <= 20),
         |r AS (SELECT q_id, n_id,
         |  ${l2FoldSql("qv", "nv", 64)} AS dist
         | FROM cand)
         |SELECT q_id, rnk, n_id, round(dist, 4) AS dist FROM (
         |  SELECT q_id, n_id, dist, row_number() OVER (
         |    PARTITION BY q_id ORDER BY dist, n_id) AS rnk FROM r)
         |WHERE rnk <= 5""".stripMargin,

    "q_pii_redact" ->
      """SELECT lang,
        | sum(CASE WHEN txt <> red THEN 1 ELSE 0 END)::BIGINT AS n_with_email,
        | sum(length(red))::BIGINT AS redacted_len,
        | count(DISTINCT md5(red)) AS n_distinct
        |FROM (SELECT lang, txt,
        |  regexp_replace(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS red
        | FROM (SELECT lang,
        |   text || ' contact ' || source || '@example.' || lang AS txt
        |  FROM documents))
        |GROUP BY lang""".stripMargin,

    "q_lang_id" ->
      """SELECT pred, count(*) AS n,
        | sum(CASE WHEN pred = lang THEN 1 ELSE 0 END)::BIGINT AS n_correct
        |FROM (SELECT lang,
        |  CASE WHEN contains(text, ' the ') THEN 'en'
        |       WHEN contains(text, ' der ') OR contains(text, ' und ') THEN 'de'
        |       WHEN contains(text, ' el ') OR contains(text, ' los ') THEN 'es'
        |       WHEN contains(text, ' le ') OR contains(text, ' les ') THEN 'fr'
        |       ELSE 'unk' END AS pred
        | FROM documents)
        |GROUP BY pred""".stripMargin,

    "q_fingerprint" ->
      """SELECT count(*) AS n,
        | count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_fp,
        | min(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS min_fp
        |FROM documents""".stripMargin,

    "q_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, lang, ${sqlShingles(sqlToks)} AS sh FROM documents),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
         |   ELSE len(list_distinct(list_intersect(a.sh, b.sh)))::DOUBLE
         |    / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE END AS j
         | FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, round(j, 4) AS j FROM p WHERE j >= 0.2""".stripMargin,

    "q_bpe_train" ->
      s"""WITH ${bpeSqlChain(3)}
         |SELECT 1 AS step, a AS sym_a, b AS sym_b, n AS pair_n FROM top1
         |UNION ALL
         |SELECT 2, a, b, n FROM top2
         |UNION ALL
         |SELECT 3, a, b, n FROM top3""".stripMargin,

    "q_bpe_apply" ->
      s"""WITH ${bpeSqlChain(3)},
         |b0 AS (SELECT lang, count(*) AS n_docs,
         |   sum(len(list_filter(string_split(s, '  '), x -> x <> '')))
         |     ::BIGINT AS toks_before
         |  FROM t0 GROUP BY lang),
         |b3 AS (SELECT lang,
         |   sum(len(list_filter(string_split(s, '  '), x -> x <> '')))
         |     ::BIGINT AS toks_after
         |  FROM t3 GROUP BY lang)
         |SELECT b0.lang, n_docs, toks_before, toks_after,
         | round(toks_before::DOUBLE / toks_after, 4) AS compression
         |FROM b0 JOIN b3 ON b0.lang = b3.lang ORDER BY b0.lang""".stripMargin,

    "q_ngram_containment" ->
      s"""WITH t AS (SELECT doc_id, lang, ${sqlShingles(sqlToks)} AS sh
         |  FROM documents),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh) AS c
         | FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id <> b.doc_id
         | WHERE len(a.sh) > 0)
         |SELECT id_a, id_b, round(c, 4) AS containment
         |FROM p WHERE c >= 0.5""".stripMargin,

    // Full bit-exact SimHash twin: per-token XXH64 replayed in SQL
    // ([[Xxh64Sql]]), tf-weighted bit votes, 64-bit signature assembly,
    // the 4 rotated 12-bit prefix buckets, candidate join with the
    // maxBucket cap, and bit_count(xor) Hamming verify — every number
    // DuckDB computes here is the same number the codegen kernel
    // computes. Validated pair-for-pair (537/537 at sf0.01, r9).
    "q_dedup_simhash" -> {
      import Xxh64Sql.{rotl, toSigned}
      s"""WITH occ AS MATERIALIZED (SELECT doc_id, unnest($sqlToks) AS t FROM documents),
         |tl AS MATERIALIZED (SELECT t, length(t) AS len FROM (SELECT DISTINCT t FROM occ)),
         |${Xxh64Sql.chain},
         |tb AS MATERIALIZED (SELECT t, j, ((h // (1::HUGEINT << j)) % 2)::INT AS bit
         |  FROM hf CROSS JOIN (SELECT unnest(range(0, 64)) AS j)),
         |cnt AS MATERIALIZED (SELECT doc_id, t, count(*) AS c FROM occ GROUP BY doc_id, t),
         |votes AS MATERIALIZED (SELECT doc_id, j, sum(c * (2*bit - 1)) AS v
         |  FROM cnt JOIN tb USING (t) GROUP BY doc_id, j),
         |sig AS MATERIALIZED (SELECT doc_id,
         |  sum(CASE WHEN v > 0 THEN (1::HUGEINT << j) ELSE 0::HUGEINT END) AS u
         |  FROM votes GROUP BY doc_id),
         |buck AS MATERIALIZED (SELECT doc_id, b,
         |  (CASE b WHEN 0 THEN u
         |          WHEN 1 THEN ${rotl("u", 16)}
         |          WHEN 2 THEN ${rotl("u", 32)}
         |          ELSE ${rotl("u", 48)} END) // ${1L << 52} AS bh, u
         |  FROM sig CROSS JOIN (SELECT unnest(range(0,4)) AS b)),
         |keptb AS MATERIALIZED (SELECT b, bh FROM buck GROUP BY b, bh HAVING count(*) <= 1000),
         |kb AS MATERIALIZED (SELECT doc_id, b, bh, u FROM buck JOIN keptb USING (b, bh)),
         |cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b,
         |    a.u AS ua, bb.u AS ub
         |  FROM kb a JOIN kb bb ON a.b = bb.b AND a.bh = bb.bh
         |    AND a.doc_id < bb.doc_id),
         |hm AS MATERIALIZED (SELECT id_a, id_b,
         |  bit_count(xor(${toSigned("ua")}, ${toSigned("ub")})) AS hamming
         |  FROM cand)
         |SELECT id_a, id_b, hamming FROM hm WHERE hamming <= 8""".stripMargin
    },

    // exact all-pairs twin of the minhash pipeline (see the q_dedup_minhash
    // registration comment for why equality holds): jaccard over distinct
    // trigram shingle STRINGS == over their 64-bit hashes (collisions
    // ~n²/2⁶⁵), cross-lang (minhashNearDup has no blocking key)
    "q_dedup_minhash" ->
      s"""WITH t AS (SELECT doc_id, ${sqlShingles(sqlToks)} AS sh FROM documents),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
         |   ELSE len(list_intersect(a.sh, b.sh))::DOUBLE
         |    / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE END AS j
         | FROM t a JOIN t b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, round(j, 4) AS j FROM p WHERE j >= 0.5""".stripMargin,

    "q_ngram_counts" ->
      s"""SELECT s, count(*) AS n
         |FROM (SELECT unnest(${sqlShinglesPos(sqlToks)}) AS s FROM documents)
         |GROUP BY s ORDER BY n DESC, s LIMIT 20""".stripMargin,

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, lang, ${sqlShingles(sqlToks)} AS sh FROM documents),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |  WHERE CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
         |   ELSE len(list_distinct(list_intersect(a.sh, b.sh)))::DOUBLE
         |    / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE END >= 0.5),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p
         |      UNION SELECT id_b, id_a FROM p),
         |n AS (SELECT DISTINCT src AS id FROM e),
         |r AS (SELECT id, id AS comp FROM n
         |      UNION
         |      SELECT e.dst AS id, r.comp FROM e JOIN r ON e.src = r.id),
         |lbl AS (SELECT id, min(comp) AS comp FROM r GROUP BY id),
         |cs AS (SELECT comp, count(*) AS sz FROM lbl GROUP BY comp)
         |SELECT count(*) AS n_clusters, sum(sz)::BIGINT AS n_docs, max(sz) AS max_cluster
         |FROM cs""".stripMargin,

    "q_neardedup_keep" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, lang, ${sqlShingles(sqlToks)} AS sh FROM documents),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |  WHERE CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
         |   ELSE len(list_distinct(list_intersect(a.sh, b.sh)))::DOUBLE
         |    / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE END >= 0.5),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p
         |      UNION SELECT id_b, id_a FROM p),
         |nn AS (SELECT DISTINCT src AS id FROM e),
         |r AS (SELECT id, id AS comp FROM nn
         |      UNION
         |      SELECT e.dst AS id, r.comp FROM e JOIN r ON e.src = r.id),
         |lbl AS (SELECT id, min(comp) AS comp FROM r GROUP BY id),
         |keepers AS (SELECT comp, min(id) AS keep FROM lbl GROUP BY comp),
         |drops AS (SELECT lbl.id FROM lbl JOIN keepers USING (comp)
         |  WHERE lbl.id <> keepers.keep)
         |SELECT lang, count(*) AS n_kept, sum(n_chars)::BIGINT AS chars,
         | min(doc_id) AS first_id
         |FROM documents WHERE doc_id NOT IN (SELECT id FROM drops)
         |GROUP BY lang""".stripMargin,

    "q_dedup_exact_docs" ->
      """SELECT count(*) AS n_groups, sum(n_dups)::BIGINT AS n_docs, max(n_dups) AS max_group
        |FROM (SELECT count(*) AS n_dups
        |  FROM documents
        |  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))""".stripMargin,

    "q_sim_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS nv FROM embeddings),
        |s AS (SELECT q_id, n_id,
        |  list_dot_product(qv, nv)
        |   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS sim
        | FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id, sim,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rnk FROM s)
        |SELECT q_id, rnk, n_id, round(sim, 4) AS sim FROM r WHERE rnk <= 5""".stripMargin,

    // dense list = the validated cosine idiom; sparse list = jaccard over
    // distinct shingle STRINGS (== over their 64-bit hashes, collisions
    // ~n²/2⁶⁵); RRF scores are sums of exact rationals 1/(60+rank)
    "q_hybrid_rrf" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
         |dq AS (SELECT vec_id AS q_id, vd FROM v WHERE vec_id < 10),
         |ds AS (SELECT q.q_id, c.vec_id AS n_id,
         |  list_dot_product(q.vd, c.vd)
         |   / (sqrt(list_dot_product(q.vd, q.vd))
         |      * sqrt(list_dot_product(c.vd, c.vd))) AS sim
         | FROM dq q CROSS JOIN v c WHERE q.q_id <> c.vec_id),
         |dense AS (SELECT q_id, n_id, rnk_d FROM (
         |  SELECT q_id, n_id, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rnk_d FROM ds)
         | WHERE rnk_d <= 20),
         |t AS (SELECT doc_id, ${sqlShingles(sqlToks)} AS sh FROM documents),
         |sj AS (SELECT q.doc_id AS q_id, c.doc_id AS n_id,
         |  CASE WHEN len(list_distinct(list_concat(q.sh, c.sh))) = 0 THEN 0.0
         |   ELSE len(list_intersect(q.sh, c.sh))::DOUBLE
         |    / len(list_distinct(list_concat(q.sh, c.sh)))::DOUBLE END AS j
         | FROM (SELECT * FROM t WHERE doc_id < 10) q CROSS JOIN t c
         | WHERE q.doc_id <> c.doc_id),
         |sparse AS (SELECT q_id, n_id, rnk_s FROM (
         |  SELECT q_id, n_id, row_number() OVER (
         |    PARTITION BY q_id ORDER BY j DESC, n_id) AS rnk_s FROM sj)
         | WHERE rnk_s <= 20),
         |fused AS (SELECT coalesce(dense.q_id, sparse.q_id) AS q_id,
         |  coalesce(dense.n_id, sparse.n_id) AS n_id,
         |  coalesce(1.0 / (60.0 + rnk_d), 0.0)
         |    + coalesce(1.0 / (60.0 + rnk_s), 0.0) AS f
         | FROM dense FULL OUTER JOIN sparse
         |   ON dense.q_id = sparse.q_id AND dense.n_id = sparse.n_id)
         |SELECT q_id, rnk, n_id, round(f, 6) AS fused FROM (
         |  SELECT q_id, n_id, f, row_number() OVER (
         |    PARTITION BY q_id ORDER BY f DESC, n_id) AS rnk FROM fused)
         |WHERE rnk <= 5""".stripMargin,

    "q_embed_standardize" ->
      """WITH e AS (SELECT vec_id, label, unnest(embedding::DOUBLE[]) AS v,
        |  generate_subscripts(embedding, 1) AS p FROM embeddings),
        |st AS (SELECT p, avg(v) AS mu,
        |  CASE WHEN stddev_pop(v) = 0 THEN 1.0 ELSE stddev_pop(v) END AS sd
        | FROM e GROUP BY p),
        |z AS (SELECT vec_id, label, sqrt(sum(((v - mu) / sd) * ((v - mu) / sd))) AS zn
        | FROM e JOIN st USING (p) GROUP BY vec_id, label)
        |SELECT label, count(*) AS n, round(avg(zn), 3) AS avg_znorm
        |FROM z GROUP BY label""".stripMargin,

    "q_novelty" ->
      s"""WITH sh AS (SELECT doc_id, lang, unnest(${sqlShingles(sqlToks)}) AS s
         |  FROM documents),
         |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
         |nov AS (SELECT doc_id, lang,
         |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*) AS novelty
         | FROM sh JOIN df USING (s) GROUP BY doc_id, lang)
         |SELECT lang, round(avg(novelty), 4) AS avg_novelty,
         | round(max(novelty), 4) AS max_novelty, count(*) AS n_docs
         |FROM nov GROUP BY lang""".stripMargin,

    "q_zipf" ->
      s"""WITH f AS (SELECT w, count(*) AS f FROM (
         |  SELECT unnest($sqlToks) AS w FROM documents) GROUP BY w),
         |r AS (SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r FROM f)
         |SELECT round(regr_slope(ln(f), ln(r)), 4) AS zipf_slope,
         | round(regr_r2(ln(f), ln(r)), 4) AS r2, count(*) AS n_terms
         |FROM r WHERE r <= 1000""".stripMargin,

    // exact-percentile cuts (DuckDB percentile_cont matches Spark's
    // exact percentile — the validated q_approx_quantile pairing);
    // boundary rows go to the lower stage on both sides (strict >)
    "q_curriculum" ->
      s"""WITH t AS (SELECT doc_id, n_chars,
         |  n_chars::DOUBLE / greatest(len($sqlToks), 1) AS score FROM documents),
         |c AS (SELECT
         |  percentile_cont(0.25) WITHIN GROUP (ORDER BY score) AS c1,
         |  percentile_cont(0.5)  WITHIN GROUP (ORDER BY score) AS c2,
         |  percentile_cont(0.75) WITHIN GROUP (ORDER BY score) AS c3 FROM t),
         |st AS (SELECT t.n_chars, t.score,
         |  1 + (t.score > c.c1)::INT + (t.score > c.c2)::INT
         |    + (t.score > c.c3)::INT AS stage
         | FROM t CROSS JOIN c)
         |SELECT stage, count(*) AS n_docs,
         | round(min(score), 4) AS min_s, round(max(score), 4) AS max_s,
         | sum(n_chars)::BIGINT AS chars
         |FROM st GROUP BY stage""".stripMargin,

    "q_kfold" ->
      """WITH f AS (SELECT doc_id, lang,
        |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 5 AS INT) AS fold
        | FROM documents)
        |SELECT fold, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
        | min(doc_id) AS first_id
        |FROM f GROUP BY fold""".stripMargin,

    "q_class_balance" ->
      """WITH c AS (SELECT min(cnt) AS m FROM (
        |  SELECT count(*) AS cnt FROM embeddings GROUP BY label)),
        |r AS (SELECT label, vec_id, row_number() OVER (
        |  PARTITION BY label ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        | FROM embeddings)
        |SELECT label, count(*) AS n_kept, min(vec_id) AS first_id
        |FROM r CROSS JOIN c WHERE rk <= m GROUP BY label""".stripMargin,

    "q_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
        |  embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
        |cp AS (SELECT vec_id AS n_id, label AS n_label,
        |  embedding::DOUBLE[] AS nv FROM embeddings),
        |s AS (SELECT q_id, q_label, n_id, n_label,
        |  list_dot_product(qv, nv)
        |   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS sim
        | FROM q CROSS JOIN cp WHERE q_label <> n_label),
        |r AS (SELECT q_id, q_label, n_id, n_label, sim,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rnk FROM s)
        |SELECT q_id, q_label, rnk, n_id, n_label, round(sim, 4) AS sim
        |FROM r WHERE rnk <= 3""".stripMargin,

    // LSH signatures are deterministic given the seed: the oracle embeds
    // the same driver-derived ±1 hyperplane matrix as VALUES literals and
    // rebuilds buckets (t·2^bits + sig), multi-probes the two
    // single-bit-flip neighbors (xor p ∈ {0,1,2}), and re-ranks
    // candidates with the validated cosine idiom.
    "q_sim_lsh" -> lshTopKOracleSql,

    // identical result multiset by construction — the persisted index
    // changes layout/physics only, so it shares the lshTopK oracle
    "q_sim_lsh_persisted" -> lshTopKOracleSql,

    // probe(build − delete) ≡ the filtered-search replay over the
    // survivors — membership AND rank refill hash-checked
    "q_sim_lsh_tombstone" -> lshTopKOracle("e2.vec_id % 7 <> 0"),

    // same pipeline with the corpus restricted to label = 3 before
    // bucketing — the filtered-search contract (pre-filter, not
    // rank-then-filter)
    "q_sim_filtered" -> lshTopKOracle("e2.label = 3"),

    // Lloyd's k-means is deterministic end to end (md5 init, fixed
    // iteration count, tie-broken argmax) — the oracle unrolls the
    // exact iterations in SQL. Cross-row float-sum order in the mean
    // update is the one engine difference; it perturbs centroids at
    // ~1e-16, far below any assignment boundary in this data.
    "q_kmeans" ->
      s"""WITH $kmeansNvPrefix,
         |${kmeansSqlChain(8, 3)}
         |SELECT cluster, count(*) AS n, min(vec_id) AS first_id
         |FROM af GROUP BY cluster""".stripMargin,

    "q_diversity_sample" ->
      s"""WITH $kmeansNvPrefix,
         |${kmeansSqlChain(8, 2)},
         |kept AS (SELECT vec_id, cluster, row_number() OVER (
         |    PARTITION BY cluster ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
         |  FROM af)
         |SELECT cluster, count(*) AS n_kept, min(vec_id) AS first_id
         |FROM kept WHERE rk <= 25 GROUP BY cluster""".stripMargin,

    "q_pq_roundtrip" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vd, label FROM embeddings),
         |${pqSqlChain(4, 8, 16, 2)},
         |dec AS (SELECT v.vec_id, v.label, v.vd,
         |    b0.cv || b1.cv || b2.cv || b3.cv AS pqv
         |  FROM v
         |  JOIN code0 ON v.vec_id = code0.vec_id JOIN cb0 b0 ON code0.ci = b0.ci
         |  JOIN code1 ON v.vec_id = code1.vec_id JOIN cb1 b1 ON code1.ci = b1.ci
         |  JOIN code2 ON v.vec_id = code2.vec_id JOIN cb2 b2 ON code2.ci = b2.ci
         |  JOIN code3 ON v.vec_id = code3.vec_id JOIN cb3 b3 ON code3.ci = b3.ci),
         |err AS (SELECT label,
         |    list_sum(list_transform(range(1, 65),
         |      i -> (vd[i::INT] - pqv[i::INT]) * (vd[i::INT] - pqv[i::INT]))) AS e
         |  FROM dec)
         |SELECT label, count(*) AS n, round(avg(e), 4) AS avg_sq_err
         |FROM err GROUP BY label""".stripMargin,

    "q_pq_search" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vd, label FROM embeddings),
         |${pqSqlChain(4, 8, 16, 2)},
         |scored AS (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |    list_dot_product(qs0.sub, b0.cv) + list_dot_product(qs1.sub, b1.cv)
         |     + list_dot_product(qs2.sub, b2.cv) + list_dot_product(qs3.sub, b3.cv) AS sim_adc
         |  FROM (SELECT vec_id FROM v WHERE vec_id < 5) q
         |  JOIN sv0 qs0 ON q.vec_id = qs0.vec_id
         |  JOIN sv1 qs1 ON q.vec_id = qs1.vec_id
         |  JOIN sv2 qs2 ON q.vec_id = qs2.vec_id
         |  JOIN sv3 qs3 ON q.vec_id = qs3.vec_id
         |  CROSS JOIN v n
         |  JOIN code0 ON n.vec_id = code0.vec_id JOIN cb0 b0 ON code0.ci = b0.ci
         |  JOIN code1 ON n.vec_id = code1.vec_id JOIN cb1 b1 ON code1.ci = b1.ci
         |  JOIN code2 ON n.vec_id = code2.vec_id JOIN cb2 b2 ON code2.ci = b2.ci
         |  JOIN code3 ON n.vec_id = code3.vec_id JOIN cb3 b3 ON code3.ci = b3.ci),
         |r AS (SELECT q_id, n_id, sim_adc,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim_adc DESC, n_id) AS rnk
         |  FROM scored)
         |SELECT q_id, rnk, n_id, round(sim_adc, 4) AS sim_r FROM r WHERE rnk <= 3""".stripMargin,

    // IVF cells are deterministic relational logic (rank dims of the
    // first nlist=16 coords by |x| desc, idx asc; cell = idx*2 +
    // sign bit), so the whole probe→candidate→re-rank path has an exact
    // DuckDB twin — corpus takes its top cell, queries probe top-6.
    "q_sim_ivf" -> ivfTopKOracleSql,

    // IVFADC: replayed PQ codebooks (pqSqlChain) + a replayed COARSE
    // raw-L2 k-means (same unrolled-Lloyd's idiom as q_kmeans, k=8,
    // iters=2) for the cells; L2-ADC distances as the exact per-element
    // (x−y)² left fold; per-query recall flag vs the full-scan ADC top-k
    "q_sim_ivfpq" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vd, label FROM embeddings),
         |${pqSqlChain(4, 8, 16, 2)},
         |${coarseL2SqlChain(8, 2)},
         |ccell AS (SELECT vec_id AS n_id, cluster AS cell FROM gaf),
         |qpc AS (SELECT vec_id AS q_id, cluster AS cell FROM (
         |    SELECT n.vec_id, c.cluster,
         |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |        list_dot_product(n.vd, c.cv) - list_dot_product(c.cv, c.cv)/2 DESC,
         |        c.cluster) AS rn
         |    FROM (SELECT vec_id, vd FROM v WHERE vec_id < 5) n CROSS JOIN gc2 c)
         |  WHERE rn <= 4),
         |adc AS (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |    ${(0 until 4).map(s => l2FoldSql(s"qs$s.sub", s"b$s.cv", 16))
                 .mkString("\n     + ")} AS dist_adc
         |  FROM (SELECT vec_id FROM v WHERE vec_id < 5) q
         |  JOIN sv0 qs0 ON q.vec_id = qs0.vec_id
         |  JOIN sv1 qs1 ON q.vec_id = qs1.vec_id
         |  JOIN sv2 qs2 ON q.vec_id = qs2.vec_id
         |  JOIN sv3 qs3 ON q.vec_id = qs3.vec_id
         |  CROSS JOIN v n
         |  JOIN code0 ON n.vec_id = code0.vec_id JOIN cb0 b0 ON code0.ci = b0.ci
         |  JOIN code1 ON n.vec_id = code1.vec_id JOIN cb1 b1 ON code1.ci = b1.ci
         |  JOIN code2 ON n.vec_id = code2.vec_id JOIN cb2 b2 ON code2.ci = b2.ci
         |  JOIN code3 ON n.vec_id = code3.vec_id JOIN cb3 b3 ON code3.ci = b3.ci),
         |rfull AS (SELECT q_id, n_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY dist_adc ASC, n_id) AS rnk
         |  FROM adc),
         |topfull AS (SELECT q_id, n_id FROM rfull WHERE rnk <= 5),
         |rivf AS (SELECT a.q_id, a.n_id, a.dist_adc,
         |    row_number() OVER (PARTITION BY a.q_id ORDER BY a.dist_adc ASC, a.n_id) AS rnk
         |  FROM adc a JOIN qpc ON a.q_id = qpc.q_id
         |             JOIN ccell ON a.n_id = ccell.n_id AND qpc.cell = ccell.cell),
         |topivf AS (SELECT q_id, rnk, n_id, dist_adc FROM rivf WHERE rnk <= 5),
         |rec AS (SELECT avg(r) AS recall FROM (
         |  SELECT t.q_id, count(m.n_id) / 5.0 AS r
         |  FROM topivf t LEFT JOIN topfull m
         |    ON t.q_id = m.q_id AND t.n_id = m.n_id
         |  GROUP BY t.q_id))
         |SELECT t.q_id, t.rnk, t.n_id, round(t.dist_adc, 4) AS dist_r,
         |  rec.recall >= 0.5 AS recall_ok
         |FROM topivf t CROSS JOIN rec""".stripMargin,

    // RESIDUAL IVFADC: coarse chain over the RAW table `vr`, residuals
    // (x − c[cell]) become the `v` that pqSqlChain trains/encodes, ADC
    // distances pair the query's per-cell residual subvectors with the
    // candidate's codewords; per-query recall vs the exhaustive
    // residual-ADC scan, macro-averaged
    "q_sim_ivfpq_res" ->
      s"""WITH vr AS (SELECT vec_id, embedding::DOUBLE[] AS vd, label FROM embeddings),
         |${coarseL2SqlChain(8, 2, "vr")},
         |v AS (SELECT g.vec_id,
         |    list_transform(range(1, 65), i -> g.vd[i::INT] - c.cv[i::INT]) AS vd,
         |    NULL AS label
         |  FROM gaf g JOIN gc2 c ON g.cluster = c.cluster),
         |${pqSqlChain(4, 8, 16, 2)},
         |ccell AS (SELECT vec_id AS n_id, cluster AS cell FROM gaf),
         |qpc AS (SELECT vec_id AS q_id, cluster AS cell FROM (
         |    SELECT n.vec_id, c.cluster,
         |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |        list_dot_product(n.vd, c.cv) - list_dot_product(c.cv, c.cv)/2 DESC,
         |        c.cluster) AS rn
         |    FROM (SELECT vec_id, vd FROM vr WHERE vec_id < 5) n CROSS JOIN gc2 c)
         |  WHERE rn <= 4),
         |qres AS (SELECT q.vec_id AS q_id, c.cluster AS cell,
         |    list_transform(range(1, 65), i -> q.vd[i::INT] - c.cv[i::INT]) AS qr
         |  FROM (SELECT vec_id, vd FROM vr WHERE vec_id < 5) q CROSS JOIN gc2 c),
         |qsub AS (SELECT q_id, cell, qr[1:16] AS s0, qr[17:32] AS s1,
         |    qr[33:48] AS s2, qr[49:64] AS s3 FROM qres),
         |adc AS (
         |  SELECT qs.q_id, n.n_id, qs.cell,
         |    ${(0 until 4).map(s => l2FoldSql(s"qs.s$s", s"b$s.cv", 16))
                 .mkString("\n     + ")} AS dist_adc
         |  FROM ccell n
         |  JOIN qsub qs ON qs.cell = n.cell
         |  JOIN code0 ON n.n_id = code0.vec_id JOIN cb0 b0 ON code0.ci = b0.ci
         |  JOIN code1 ON n.n_id = code1.vec_id JOIN cb1 b1 ON code1.ci = b1.ci
         |  JOIN code2 ON n.n_id = code2.vec_id JOIN cb2 b2 ON code2.ci = b2.ci
         |  JOIN code3 ON n.n_id = code3.vec_id JOIN cb3 b3 ON code3.ci = b3.ci),
         |rfull AS (SELECT q_id, n_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY dist_adc ASC, n_id) AS rnk
         |  FROM adc),
         |topfull AS (SELECT q_id, n_id FROM rfull WHERE rnk <= 5),
         |rivf AS (SELECT a.q_id, a.n_id, a.dist_adc,
         |    row_number() OVER (PARTITION BY a.q_id ORDER BY a.dist_adc ASC, a.n_id) AS rnk
         |  FROM adc a JOIN qpc ON a.q_id = qpc.q_id AND a.cell = qpc.cell),
         |topivf AS (SELECT q_id, rnk, n_id, dist_adc FROM rivf WHERE rnk <= 5),
         |rec AS (SELECT avg(r) AS recall FROM (
         |  SELECT t.q_id, count(m.n_id) / 5.0 AS r
         |  FROM topivf t LEFT JOIN topfull m
         |    ON t.q_id = m.q_id AND t.n_id = m.n_id
         |  GROUP BY t.q_id))
         |SELECT t.q_id, t.rnk, t.n_id, round(t.dist_adc, 4) AS dist_r,
         |  rec.recall >= 0.5 AS recall_ok
         |FROM topivf t CROSS JOIN rec""".stripMargin,

    // END-TO-END serving twin: clustered corpus (integer-lattice centers
    // + raw embedding noise — exact arithmetic on both engines), the
    // q_sim_ivfpq_res replay chain (coarse Lloyd's over vr, residual v,
    // PQ codebooks), candidates = residual-ADC top-50 within the 4
    // probed cells, exact-L2 re-rank to top-5 (l2FoldSql), recall vs
    // the exhaustive exact-L2 top-5
    "q_sim_ivfpq_refine" ->
      s"""WITH vr AS MATERIALIZED (SELECT vec_id,
         |    list_transform(range(1, 65), i ->
         |      ((label*37 + (i-1)*17) % 13 - 6)::DOUBLE
         |        + embedding[i::INT]::DOUBLE) AS vd,
         |    label FROM embeddings),
         |${coarseL2SqlChain(10, 3, "vr")},
         |v AS MATERIALIZED (SELECT g.vec_id,
         |    list_transform(range(1, 65), i -> g.vd[i::INT] - c.cv[i::INT]) AS vd,
         |    NULL AS label
         |  FROM gaf g JOIN gc3 c ON g.cluster = c.cluster),
         |${pqSqlChain(16, 32, 4, 3)},
         |ccell AS (SELECT vec_id AS n_id, cluster AS cell FROM gaf),
         |qpc AS (SELECT vec_id AS q_id, cluster AS cell FROM (
         |    SELECT n.vec_id, c.cluster,
         |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |        list_dot_product(n.vd, c.cv) - list_dot_product(c.cv, c.cv)/2 DESC,
         |        c.cluster) AS rn
         |    FROM (SELECT vec_id, vd FROM vr WHERE vec_id < 5) n CROSS JOIN gc3 c)
         |  WHERE rn <= 4),
         |qres AS (SELECT q.vec_id AS q_id, c.cluster AS cell,
         |    list_transform(range(1, 65), i -> q.vd[i::INT] - c.cv[i::INT]) AS qr
         |  FROM (SELECT vec_id, vd FROM vr WHERE vec_id < 5) q CROSS JOIN gc3 c),
         |qsub AS (SELECT q_id, cell,
         |    ${(0 until 16).map(j => s"qr[${j * 4 + 1}:${j * 4 + 4}] AS s$j")
                 .mkString(", ")} FROM qres),
         |adc AS (
         |  SELECT qs.q_id, n.n_id, qs.cell,
         |    ${(0 until 16).map(s => l2FoldSql(s"qs.s$s", s"b$s.cv", 4))
                 .mkString("\n     + ")} AS dist_adc
         |  FROM ccell n
         |  JOIN qsub qs ON qs.cell = n.cell
         |  ${(0 until 16).map(s =>
                 s"JOIN code$s ON n.n_id = code$s.vec_id JOIN cb$s b$s ON code$s.ci = b$s.ci")
                 .mkString("\n  ")}),
         |rivf AS (SELECT a.q_id, a.n_id, a.dist_adc,
         |    row_number() OVER (PARTITION BY a.q_id ORDER BY a.dist_adc ASC, a.n_id) AS rnk
         |  FROM adc a JOIN qpc ON a.q_id = qpc.q_id AND a.cell = qpc.cell),
         |cand AS (SELECT DISTINCT q_id, n_id FROM rivf WHERE rnk <= 50),
         |ref AS (SELECT c.q_id, c.n_id,
         |    ${l2FoldSql("q.vd", "n.vd", 64)} AS dist
         |  FROM cand c JOIN vr q ON c.q_id = q.vec_id
         |              JOIN vr n ON c.n_id = n.vec_id),
         |rref AS (SELECT q_id, n_id, dist,
         |    row_number() OVER (PARTITION BY q_id ORDER BY dist, n_id) AS rnk
         |  FROM ref),
         |top AS (SELECT q_id, rnk, n_id, dist FROM rref WHERE rnk <= 5),
         |exact AS (SELECT q_id, n_id FROM (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      ${l2FoldSql("q.vd", "n.vd", 64)}, n.vec_id) AS rk
         |  FROM (SELECT vec_id, vd FROM vr WHERE vec_id < 5) q CROSS JOIN vr n)
         |  WHERE rk <= 5),
         |rec AS (SELECT avg(r) AS recall FROM (
         |  SELECT t.q_id, count(e.n_id) / 5.0 AS r
         |  FROM top t LEFT JOIN exact e
         |    ON t.q_id = e.q_id AND t.n_id = e.n_id
         |  GROUP BY t.q_id))
         |SELECT t.q_id, t.rnk, t.n_id, round(t.dist, 4) AS dist,
         |  rec.recall >= 0.8 AS recall_ok
         |FROM top t CROSS JOIN rec""".stripMargin,

    // identical result multiset by construction (layout change only)
    "q_sim_ivf_persisted" -> ivfTopKOracleSql,

    // probe(build − delete) ≡ the inverted-file replay over the
    // survivors (same cell assignment, corpus side filtered)
    "q_sim_ivf_tombstone" -> ivfTopKOracle("vec_id % 7 <> 0"),

    "q_knn_label" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS nv, label FROM embeddings),
        |s AS (SELECT q_id, n_id, label,
        |  list_dot_product(qv, nv)
        |   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS sim
        | FROM q, c WHERE q_id <> n_id),
        |r AS (SELECT q_id, n_id, label, sim,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rnk FROM s),
        |v AS (SELECT q_id, label AS n_label, count(*) AS votes
        |  FROM r WHERE rnk <= 10 GROUP BY q_id, label),
        |w AS (SELECT q_id, n_label, votes,
        |  row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, n_label) AS rn FROM v)
        |SELECT q_id, n_label AS pred_label, votes FROM w WHERE rn = 1""".stripMargin,

    "q_embed_norm" ->
      """SELECT label,
        | round(sum(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 2) AS sum_norm,
        | round(sum(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 2) AS sum_sq,
        | count(*) AS n
        |FROM embeddings GROUP BY label""".stripMargin,

    "q_collocations_pmi" ->
      s"""WITH toks AS (SELECT $sqlToks AS t FROM documents),
         |u AS (SELECT unnest(t) AS w FROM toks),
         |uc AS (SELECT w, count(*) AS c_w FROM u GROUP BY w),
         |b AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM toks,
         |      LATERAL (SELECT unnest(range(1, len(t))) AS i) r),
         |bc AS (SELECT w1, w2, count(*) AS c_xy FROM b GROUP BY w1, w2),
         |nu AS (SELECT count(*)::DOUBLE AS n_u FROM u),
         |nb AS (SELECT count(*)::DOUBLE AS n_b FROM b)
         |SELECT w1, w2, c_xy,
         | floor(ln(c_xy::DOUBLE * n_u * n_u / (n_b * c_w1 * c_w2)) * 100
         |   + 0.5) / 100 AS pmi
         |FROM bc
         |JOIN (SELECT w AS w1j, c_w AS c_w1 FROM uc) ON w1 = w1j
         |JOIN (SELECT w AS w2j, c_w AS c_w2 FROM uc) ON w2 = w2j
         |CROSS JOIN nu CROSS JOIN nb
         |WHERE c_xy >= 5
         |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    "q_rake" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |t AS (SELECT doc_id, unnest(toks) AS w,
         |   generate_subscripts(toks, 1) AS pos FROM tk),
         |m AS (SELECT doc_id, pos, w,
         |   w IN ('the','a','of','and','to','in','is','for','on','with')
         |     AS is_stop FROM t),
         |c0 AS (SELECT doc_id, pos, w, is_stop,
         |   sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
         |     OVER (PARTITION BY doc_id ORDER BY pos
         |       ROWS UNBOUNDED PRECEDING) AS pk
         |  FROM m),
         |cc AS (SELECT doc_id, pos, w, pk FROM c0 WHERE NOT is_stop),
         |p AS (SELECT doc_id, pk,
         |   string_agg(w, ' ' ORDER BY pos) AS phrase, count(*) AS plen
         |  FROM cc GROUP BY 1, 2),
         |wl AS (SELECT cc.doc_id, cc.pk, cc.pos, cc.w, p.phrase, p.plen
         |  FROM cc JOIN p USING (doc_id, pk)),
         |ws AS (SELECT w, sum(plen)::DOUBLE / count(*) AS score
         |  FROM wl GROUP BY w),
         |occ AS (SELECT wl.doc_id, wl.pk, wl.phrase,
         |   list_reduce(list(ws.score ORDER BY wl.pos),
         |     (a, b) -> a + b) AS s_occ
         |  FROM wl JOIN ws USING (w) GROUP BY 1, 2, 3)
         |SELECT phrase, count(*) AS n_occ, round(max(s_occ), 4) AS rake
         |FROM occ GROUP BY phrase
         |ORDER BY rake DESC, phrase LIMIT 10""".stripMargin,

    "q_stopword_filter" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents)
         |SELECT doc_id, len(toks) AS n_total, len(content) AS n_content,
         | array_to_string(content[1:8], ' ') AS head_content
         |FROM (SELECT doc_id, toks, list_filter(toks, x -> x NOT IN
         |  ('the','a','of','and','to','in','is')) AS content FROM t)""".stripMargin,

    "q_prefix_dedup" ->
      """SELECT md5(regexp_replace(lower(substring(text, 1, 64)),
        |   '\s+', ' ', 'g')) AS pfx,
        | count(*) AS n_docs, min(doc_id) AS canonical_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1
        |ORDER BY canonical_id""".stripMargin,

    "q_sentence_stats" ->
      """WITH s AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '[.!?]+'),
        |    x -> len(trim(x)) > 0) AS sents
        | FROM documents)
        |SELECT doc_id, len(sents) AS n_sents,
        | floor(list_sum(list_transform(sents, x -> len(trim(x))))::DOUBLE
        |   / len(sents) * 100 + 0.5) / 100 AS avg_sent_chars
        |FROM s WHERE len(sents) > 0""".stripMargin,

    "q_chunk_sentences" ->
      """WITH s AS (SELECT doc_id, unnest(sents) AS sent,
        |   generate_subscripts(sents, 1) AS pos
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(text, '[.!?]+'),
        |      x -> len(trim(x)) > 0) AS sents
        |   FROM documents)),
        |t AS (SELECT doc_id, pos,
        |   len(string_split_regex(trim(sent), '\s+')) AS n_tok
        |  FROM s),
        |seg AS (SELECT doc_id, pos, unnest(segs) AS seg_tok,
        |   generate_subscripts(segs, 1) AS sub
        |  FROM (SELECT doc_id, pos,
        |    list_transform(range(0, CAST(ceil(n_tok / 12.0) AS INTEGER)),
        |      i -> least(12, n_tok - i * 12)) AS segs
        |   FROM t)),
        |c AS (SELECT doc_id, seg_tok,
        |   sum(seg_tok) OVER (PARTITION BY doc_id ORDER BY pos, sub
        |     ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM seg)
        |SELECT doc_id,
        | CAST(floor((cum - seg_tok) / 40) AS INTEGER) AS chunk_id,
        | count(*) AS n_segs, sum(seg_tok)::BIGINT AS chunk_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT source, count(*) AS n, sum(strlen(text))::BIGINT AS n_bytes,
        | min(strlen(text)) AS min_bytes
        |FROM documents GROUP BY source""".stripMargin,

    // the stub PCM is ord(byte)−64 over all-ASCII text, so the whole
    // window/RMS/zero-crossing pipeline replays exactly in SQL
    "q_multimodal_audio" ->
      """WITH s AS (SELECT doc_id, source AS mime,
        |   list_transform(range(1, length(text)+1),
        |     i -> ord(substr(text, i::INT, 1)) - 64) AS pcm
        |  FROM documents WHERE doc_id < 300),
        |wi AS (SELECT mime, pcm,
        |   unnest(range(0, (len(pcm)+15)//16)) AS w_idx FROM s),
        |w AS (SELECT mime,
        |   pcm[w_idx*16+1 : least(w_idx*16+16, len(pcm))] AS win FROM wi),
        |m AS (SELECT mime, len(win) AS n,
        |  sqrt(list_sum(list_transform(win, x -> x*x))::DOUBLE
        |    / len(win)) AS rms,
        |  len(list_filter(range(1, len(win)),
        |    j -> (win[j] < 0) != (win[j+1] < 0))) AS zc
        | FROM w)
        |SELECT mime, count(*) AS n_windows, round(sum(rms), 2) AS sum_rms,
        | sum(zc)::BIGINT AS sum_zc,
        | sum(CASE WHEN n < 16 THEN 1 ELSE 0 END)::BIGINT AS n_partial
        |FROM m GROUP BY mime ORDER BY mime""".stripMargin,

    // The stub codec is deterministic JVM arithmetic (Arrays.hashCode =
    // 31-polynomial over the UTF-8 bytes with int32 wraparound), so the
    // whole decode→resize pipeline IS DuckDB-expressible: list_reduce
    // replays the polynomial in BIGINT with an explicit mod-2^32 wrap
    // (documents.text is all-ASCII, so ord(char) == byte), and >> k on a
    // signed int32 is floor(h / 2^k). This oracles the real surface —
    // schema, UDF plumbing, resize algebra — not just row counts.
    "q_multimodal_decode" ->
      """WITH b AS (
        | SELECT doc_id, source AS mime, length(text) AS len,
        |  CASE WHEN length(text) = 0 THEN NULL ELSE
        |   list_reduce(
        |    list_prepend(1::BIGINT,
        |     list_transform(range(1, length(text)+1),
        |      i -> ord(substr(text, i::INT, 1))::BIGINT)),
        |    (a, x) -> ((31*a + x + 2147483648) % 4294967296 + 4294967296)
        |              % 4294967296 - 2147483648)
        |  END AS h
        | FROM documents),
        |m AS (
        | SELECT mime, len,
        |  CASE WHEN h IS NULL THEN 0 ELSE abs(h % 1920) + 1 END AS w,
        |  CASE WHEN h IS NULL THEN 0
        |   ELSE abs(CAST(floor(h / 256.0) AS BIGINT) % 1080) + 1 END AS hh,
        |  (h IS NOT NULL) AS ok
        | FROM b),
        |rz AS (
        | SELECT mime, ok, least(w, 640) AS w_cap,
        |  CASE WHEN len = 0 OR w <= 0 OR hh <= 0 THEN len
        |   ELSE least(greatest(1, CAST(trunc(
        |     (len * least(1.0, least(640.0/w, 480.0/hh)))
        |      * least(1.0, least(640.0/w, 480.0/hh))) AS BIGINT)), len)
        |  END AS rbytes
        | FROM m)
        |SELECT mime, count(*) AS n,
        | sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_ok,
        | max(w_cap) AS max_w, sum(rbytes)::BIGINT AS resized_bytes
        |FROM rz GROUP BY mime""".stripMargin,

    // replays the synthWav parameter/sample formulas over the decoded
    // interleaved PCM stream (frame-major, channel-minor: j → frame j//ch,
    // channel j%ch); all-integer, so no float tolerance anywhere
    "q_wav_decode" ->
      """WITH p AS (SELECT doc_id AS s, 1 + doc_id % 2 AS ch,
        |   8000 + (doc_id % 3) * 4000 AS sr, 16 + doc_id % 50 AS nf
        |  FROM documents WHERE doc_id < 400),
        |sm AS (SELECT s, ch, sr, nf,
        |   list_transform(range(0, nf*ch),
        |     j -> (((s*31 + (j // ch)*7 + (j % ch)*13) % 256) - 128) * 64)
        |     AS pcm
        |  FROM p),
        |st AS (SELECT sr, ch, nf,
        |   list_sum(list_transform(pcm, x -> x*x))::BIGINT AS energy,
        |   len(list_filter(range(1, len(pcm)),
        |     j -> (pcm[j] < 0) != (pcm[j+1] < 0)))::BIGINT AS zc
        |  FROM sm)
        |SELECT sr::BIGINT AS sample_rate, count(*) AS n_media,
        | count(*)::BIGINT AS n_ok, sum(nf)::BIGINT AS sum_frames,
        | sum(ch)::BIGINT AS sum_channels, sum(energy)::BIGINT AS total_energy,
        | sum(zc)::BIGINT AS total_zc
        |FROM st GROUP BY sr ORDER BY sample_rate""".stripMargin,

    // replays the synthBmp formulas: pixel j → (x, y, channel) via
    // x=(j//3)%w, y=j//(3w), k=j%3; padding bytes are not in the sum
    "q_bmp_decode" ->
      """WITH p AS (SELECT doc_id AS s, 1 + doc_id % 16 AS w,
        |   1 + doc_id % 8 AS h
        |  FROM documents WHERE doc_id < 300),
        |px AS (SELECT s, w, h,
        |  list_sum(list_transform(range(0, w*h*3),
        |    j -> (s + ((j // 3) % w)*3 + (j // (3*w))*7 + (j % 3)) % 256))
        |    ::BIGINT AS psum
        | FROM p)
        |SELECT w::BIGINT AS width, count(*) AS n_media,
        | count(*)::BIGINT AS n_ok, sum(h)::BIGINT AS sum_height,
        | sum(psum)::BIGINT AS sum_pixels
        |FROM px GROUP BY w ORDER BY width""".stripMargin,

    // replays synthBmpNear's multiplicative pixel formula (never parsing
    // bytes): 18×16 image → grid sample px=2·gx, py=2·gy; integer luma;
    // dHash bit idx = gy·8+gx compares gray(gx+1) > gray(gx); bands are
    // 16-bit chunks of the bit index; candidates = band equality,
    // verified at hamming ≤ 3 over the raw bit vectors
    "q_image_phash" ->
      """WITH im AS (SELECT doc_id, doc_id // 2 AS s, (doc_id % 2) * 128 AS pert
        |  FROM documents),
        |ix AS (SELECT doc_id, pert, gy, gx,
        |   s + 1000003*(2*gx + 36*gy) AS i0,
        |   s + 1000003*(2*gx + 36*gy + 288) AS i1,
        |   s + 1000003*(2*gx + 36*gy + 576) AS i2
        |  FROM im, range(0, 8) t1(gy), range(0, 9) t2(gx)),
        |g AS (SELECT doc_id, gy, gx,
        |   299*(((i2*i2) // 1048576) % 256)
        | + 587*(((i1*i1) // 1048576) % 256)
        | + 114*((((i0*i0) // 1048576) % 256
        |         + CASE WHEN gx = 0 AND gy = 0 THEN pert ELSE 0 END) % 256)
        |   AS gray
        |  FROM ix),
        |bits AS (SELECT a.doc_id, a.gy*8 + a.gx AS idx, (b.gray > a.gray) AS bit
        |  FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.gy = b.gy
        |    AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |bv AS (SELECT doc_id, idx // 16 AS band,
        |   sum(CASE WHEN bit THEN (1::BIGINT << (idx % 16)) ELSE 0 END)::BIGINT
        |     AS bval
        |  FROM bits GROUP BY doc_id, band),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bv a JOIN bv b ON a.band = b.band AND a.bval = b.bval
        |    AND a.doc_id < b.doc_id),
        |ham AS (SELECT c.id_a, c.id_b,
        |   sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)::INT AS hamming
        |  FROM cand c JOIN bits x ON x.doc_id = c.id_a
        |              JOIN bits y ON y.doc_id = c.id_b AND y.idx = x.idx
        |  GROUP BY c.id_a, c.id_b)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""".stripMargin,

    // cross-modal twin: the image chain (seed doc_id, no pert) and the
    // video-keyframe chain (planted/disjoint seed mapping + 1-pixel
    // pert) replayed side by side, banded on 16-bit chunks, joined
    // ACROSS the two bit tables (no a<b — distinct id spaces), hamming
    // ≤ 3 verify
    "q_crossmodal_dup" ->
      """WITH gi AS (SELECT doc_id, gy, gx,
        |   299*(((i2*i2) // 1048576) % 256)
        | + 587*(((i1*i1) // 1048576) % 256)
        | + 114*(((i0*i0) // 1048576) % 256)
        |   AS gray
        |  FROM (SELECT doc_id, gy, gx,
        |     (doc_id % 1000000) + 1000003*(2*gx + 36*gy) AS i0,
        |     (doc_id % 1000000) + 1000003*(2*gx + 36*gy + 288) AS i1,
        |     (doc_id % 1000000) + 1000003*(2*gx + 36*gy + 576) AS i2
        |    FROM documents, range(0, 8) t1(gy), range(0, 9) t2(gx))),
        |bitsi AS (SELECT a.doc_id, a.gy*8 + a.gx AS idx, (b.gray > a.gray) AS bit
        |  FROM gi a JOIN gi b ON a.doc_id = b.doc_id AND a.gy = b.gy
        |    AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |bvi AS (SELECT doc_id, idx // 16 AS band,
        |   sum(CASE WHEN bit THEN (1::BIGINT << (idx % 16)) ELSE 0 END)::BIGINT
        |     AS bval
        |  FROM bitsi GROUP BY doc_id, band),
        |vm AS (SELECT doc_id,
        |   (CASE WHEN doc_id % 3 = 0 THEN doc_id
        |         ELSE 500000 + doc_id % 200000 END) % 1000000 AS s,
        |   (doc_id % 2) * 128 AS pert FROM documents),
        |gv AS (SELECT doc_id, gy, gx,
        |   299*(((i2*i2) // 1048576) % 256)
        | + 587*(((i1*i1) // 1048576) % 256)
        | + 114*((((i0*i0) // 1048576) % 256
        |         + CASE WHEN gx = 0 AND gy = 0 THEN pert ELSE 0 END) % 256)
        |   AS gray
        |  FROM (SELECT doc_id, pert, gy, gx,
        |     s + 1000003*(2*gx + 36*gy) AS i0,
        |     s + 1000003*(2*gx + 36*gy + 288) AS i1,
        |     s + 1000003*(2*gx + 36*gy + 576) AS i2
        |    FROM vm, range(0, 8) t1(gy), range(0, 9) t2(gx))),
        |bitsv AS (SELECT a.doc_id, a.gy*8 + a.gx AS idx, (b.gray > a.gray) AS bit
        |  FROM gv a JOIN gv b ON a.doc_id = b.doc_id AND a.gy = b.gy
        |    AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |bvv AS (SELECT doc_id, idx // 16 AS band,
        |   sum(CASE WHEN bit THEN (1::BIGINT << (idx % 16)) ELSE 0 END)::BIGINT
        |     AS bval
        |  FROM bitsv GROUP BY doc_id, band),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bvi a JOIN bvv b ON a.band = b.band AND a.bval = b.bval),
        |ham AS (SELECT c.id_a, c.id_b,
        |   sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)::INT AS hamming
        |  FROM cand c JOIN bitsi x ON x.doc_id = c.id_a
        |              JOIN bitsv y ON y.doc_id = c.id_b AND y.idx = x.idx
        |  GROUP BY c.id_a, c.id_b)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""".stripMargin,

    // the multi-frame twin: the video replay gains a frame axis — every
    // frame f < nf gets the grid, with the frame term 7777777·(f+1)
    // EXCEPT at the reuse frame rf = ((doc_id//3) % 8) % nf, where the
    // term drops (that frame IS the synthBmpNear plane) and the
    // perturbation applies; banding and the hamming verify run per
    // (doc_id, f) signature
    "q_crossmodal_frames" ->
      """WITH gi AS (SELECT doc_id, gy, gx,
        |   299*(((i2*i2) // 1048576) % 256)
        | + 587*(((i1*i1) // 1048576) % 256)
        | + 114*(((i0*i0) // 1048576) % 256)
        |   AS gray
        |  FROM (SELECT doc_id, gy, gx,
        |     (doc_id % 1000000) + 1000003*(2*gx + 36*gy) AS i0,
        |     (doc_id % 1000000) + 1000003*(2*gx + 36*gy + 288) AS i1,
        |     (doc_id % 1000000) + 1000003*(2*gx + 36*gy + 576) AS i2
        |    FROM documents, range(0, 8) t1(gy), range(0, 9) t2(gx))),
        |bitsi AS (SELECT a.doc_id, a.gy*8 + a.gx AS idx, (b.gray > a.gray) AS bit
        |  FROM gi a JOIN gi b ON a.doc_id = b.doc_id AND a.gy = b.gy
        |    AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |bvi AS (SELECT doc_id, idx // 16 AS band,
        |   sum(CASE WHEN bit THEN (1::BIGINT << (idx % 16)) ELSE 0 END)::BIGINT
        |     AS bval
        |  FROM bitsi GROUP BY doc_id, band),
        |vm AS (SELECT doc_id,
        |   (CASE WHEN doc_id % 3 = 0 THEN doc_id
        |         ELSE 500000 + doc_id % 200000 END) % 1000000 AS s,
        |   (doc_id % 2) * 128 AS pert FROM documents),
        |vf AS (SELECT doc_id, s, pert, f,
        |   ((doc_id // 3) % 8) % (4 + s % 5) AS rf
        |  FROM vm, range(0, 8) tf(f) WHERE f < 4 + s % 5),
        |gv AS (SELECT doc_id, f, gy, gx,
        |   299*(((i2*i2) // 1048576) % 256)
        | + 587*(((i1*i1) // 1048576) % 256)
        | + 114*((((i0*i0) // 1048576) % 256
        |         + CASE WHEN gx = 0 AND gy = 0 AND f = rf THEN pert ELSE 0 END)
        |        % 256)
        |   AS gray
        |  FROM (SELECT doc_id, pert, f, rf, gy, gx,
        |     s + 1000003*(2*gx + 36*gy) + ft AS i0,
        |     s + 1000003*(2*gx + 36*gy + 288) + ft AS i1,
        |     s + 1000003*(2*gx + 36*gy + 576) + ft AS i2
        |    FROM (SELECT doc_id, s, pert, f, rf,
        |       CASE WHEN f = rf THEN 0 ELSE 7777777*(f+1) END AS ft FROM vf),
        |     range(0, 8) t1(gy), range(0, 9) t2(gx))),
        |bitsv AS (SELECT a.doc_id, a.f, a.gy*8 + a.gx AS idx,
        |   (b.gray > a.gray) AS bit
        |  FROM gv a JOIN gv b ON a.doc_id = b.doc_id AND a.f = b.f
        |    AND a.gy = b.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |bvv AS (SELECT doc_id, f, idx // 16 AS band,
        |   sum(CASE WHEN bit THEN (1::BIGINT << (idx % 16)) ELSE 0 END)::BIGINT
        |     AS bval
        |  FROM bitsv GROUP BY doc_id, f, band),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS vid_id, b.f
        |  FROM bvi a JOIN bvv b ON a.band = b.band AND a.bval = b.bval),
        |ham AS (SELECT c.id_a, c.vid_id, c.f,
        |   sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)::INT AS hamming
        |  FROM cand c JOIN bitsi x ON x.doc_id = c.id_a
        |              JOIN bitsv y ON y.doc_id = c.vid_id AND y.f = c.f
        |                AND y.idx = x.idx
        |  GROUP BY c.id_a, c.vid_id, c.f)
        |SELECT id_a, vid_id, f::INT AS frame_idx, hamming
        |FROM ham WHERE hamming <= 3""".stripMargin,

    // replays the pixel formula → grayscale grid → exact-integer cosine
    // (dot products of 72 ints ≤ 255k stay < 2^53 — no float drift
    // before the final sqrt/divide, which round identically)
    "q_image_knn" ->
      """WITH im AS (SELECT doc_id, doc_id // 2 AS s, (doc_id % 2) * 128 AS pert
        |  FROM documents),
        |ix AS (SELECT doc_id, pert, gy, gx,
        |   s + 1000003*(2*gx + 36*gy) AS i0,
        |   s + 1000003*(2*gx + 36*gy + 288) AS i1,
        |   s + 1000003*(2*gx + 36*gy + 576) AS i2
        |  FROM im, range(0, 8) t1(gy), range(0, 9) t2(gx)),
        |g AS (SELECT doc_id, gy, gx,
        |   299*(((i2*i2) // 1048576) % 256)
        | + 587*(((i1*i1) // 1048576) % 256)
        | + 114*((((i0*i0) // 1048576) % 256
        |         + CASE WHEN gx = 0 AND gy = 0 THEN pert ELSE 0 END) % 256)
        |   AS gray
        |  FROM ix),
        |v AS (SELECT doc_id, list(gray::DOUBLE ORDER BY gy, gx) AS vd
        |  FROM g GROUP BY doc_id),
        |q AS (SELECT doc_id AS q_id, vd AS qv FROM v WHERE doc_id < 10),
        |sc AS (SELECT q_id, b.doc_id AS n_id,
        |   list_dot_product(qv, b.vd)
        |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(b.vd, b.vd)))
        |     AS sim
        |  FROM q CROSS JOIN v b WHERE q_id <> b.doc_id)
        |SELECT q_id, rnk, n_id, round(sim, 4) AS sim FROM (
        |  SELECT q_id, n_id, sim, row_number() OVER (
        |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rnk FROM sc)
        |WHERE rnk <= 3""".stripMargin,

    // replays synthBmpNear's pixel formula + the integer box mean:
    // output pixel (ox,oy,k) = floor(mean of the 2×2 input block)
    "q_image_resize" ->
      """WITH im AS (SELECT doc_id AS s FROM documents WHERE doc_id < 300),
        |cell AS (SELECT s,
        |   ( ((i00*i00) // 1048576) % 256 + ((i10*i10) // 1048576) % 256
        |   + ((i01*i01) // 1048576) % 256 + ((i11*i11) // 1048576) % 256 ) // 4
        |     AS m
        |  FROM (SELECT s,
        |     s + 1000003*((2*ox)   + 18*(2*oy)   + 288*k) AS i00,
        |     s + 1000003*((2*ox+1) + 18*(2*oy)   + 288*k) AS i10,
        |     s + 1000003*((2*ox)   + 18*(2*oy+1) + 288*k) AS i01,
        |     s + 1000003*((2*ox+1) + 18*(2*oy+1) + 288*k) AS i11
        |    FROM im, range(0, 9) a(ox), range(0, 8) b(oy), range(0, 3) c(k)))
        |SELECT count(DISTINCT s) AS n_media,
        | count(DISTINCT s)::BIGINT AS n_ok,
        | (count(DISTINCT s) * 9)::BIGINT AS sum_w,
        | (count(DISTINCT s) * 8)::BIGINT AS sum_h,
        | sum(m)::BIGINT AS sum_pixels
        |FROM cell""".stripMargin,

    // replays synthAviNear's formulas: nf = 4 + s%5, us = 33333·(1+s%3),
    // per-frame pixel j → (f, x, y, k); padding bytes are not in the sum
    "q_avi_decode" ->
      """WITH p AS (SELECT doc_id AS s, 4 + doc_id % 5 AS nf,
        |   33333 * (1 + doc_id % 3) AS us
        |  FROM documents WHERE doc_id < 300),
        |px AS (SELECT s, nf, us,
        |  sum((((s + 1000003*(((j // 3) % 18) + 18*((j // 54) % 16)
        |        + 288*(j % 3)) + 7777777*(j // 864))
        |      * (s + 1000003*(((j // 3) % 18) + 18*((j // 54) % 16)
        |        + 288*(j % 3)) + 7777777*(j // 864))) // 1048576) % 256)
        |    ::BIGINT AS psum
        | FROM p, range(0, 6912) t(j)
        | WHERE j < nf * 864
        | GROUP BY s, nf, us)
        |SELECT nf::BIGINT AS n_frames, count(*) AS n_media,
        | count(*)::BIGINT AS n_ok, sum(us)::BIGINT AS sum_us,
        | sum(psum)::BIGINT AS sum_pixels
        |FROM px GROUP BY nf ORDER BY n_frames""".stripMargin,

    // keyframe (frame 0) twin of the q_image_phash replay with the
    // video corpus's 500000-offset seeds
    "q_video_phash" ->
      """WITH im AS (SELECT doc_id, doc_id // 2 + 500000 AS s,
        |   (doc_id % 2) * 128 AS pert
        |  FROM documents),
        |ix AS (SELECT doc_id, pert, gy, gx,
        |   s + 1000003*(2*gx + 36*gy) AS i0,
        |   s + 1000003*(2*gx + 36*gy + 288) AS i1,
        |   s + 1000003*(2*gx + 36*gy + 576) AS i2
        |  FROM im, range(0, 8) t1(gy), range(0, 9) t2(gx)),
        |g AS (SELECT doc_id, gy, gx,
        |   299*(((i2*i2) // 1048576) % 256)
        | + 587*(((i1*i1) // 1048576) % 256)
        | + 114*((((i0*i0) // 1048576) % 256
        |         + CASE WHEN gx = 0 AND gy = 0 THEN pert ELSE 0 END) % 256)
        |   AS gray
        |  FROM ix),
        |bits AS (SELECT a.doc_id, a.gy*8 + a.gx AS idx, (b.gray > a.gray) AS bit
        |  FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.gy = b.gy
        |    AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |bv AS (SELECT doc_id, idx // 16 AS band,
        |   sum(CASE WHEN bit THEN (1::BIGINT << (idx % 16)) ELSE 0 END)::BIGINT
        |     AS bval
        |  FROM bits GROUP BY doc_id, band),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bv a JOIN bv b ON a.band = b.band AND a.bval = b.bval
        |    AND a.doc_id < b.doc_id),
        |ham AS (SELECT c.id_a, c.id_b,
        |   sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)::INT AS hamming
        |  FROM cand c JOIN bits x ON x.doc_id = c.id_a
        |              JOIN bits y ON y.doc_id = c.id_b AND y.idx = x.idx
        |  GROUP BY c.id_a, c.id_b)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""".stripMargin,

    // replays synthWavNear's sample formula (never parsing bytes):
    // 2080 mono samples → 65 windows of exactly 32 → integer energies →
    // 64 comparison bits → 16-bit band equality → hamming ≤ 3 verify
    "q_audio_fp" ->
      """WITH im AS (SELECT doc_id, doc_id // 2 AS s, (doc_id % 2) * 1024 AS pert
        |  FROM documents),
        |sm AS (SELECT doc_id, (32*w + k) // 32 AS w,
        |   CASE WHEN 32*w + k = 0 THEN
        |     ((((s + 1000003*(32*w + k)) * (s + 1000003*(32*w + k))) // 1048576)
        |       % 4096 - 2048 + 2048 + pert) % 4096 - 2048
        |   ELSE
        |     (((s + 1000003*(32*w + k)) * (s + 1000003*(32*w + k))) // 1048576)
        |       % 4096 - 2048
        |   END AS x
        |  FROM im, range(0, 65) t1(w), range(0, 32) t2(k)),
        |en AS (SELECT doc_id, w, sum(x*x)::BIGINT AS e
        |  FROM sm GROUP BY doc_id, w),
        |bits AS (SELECT a.doc_id, a.w AS idx, (b.e > a.e) AS bit
        |  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.w = a.w + 1
        |  WHERE a.w < 64),
        |bv AS (SELECT doc_id, idx // 16 AS band,
        |   sum(CASE WHEN bit THEN (1::BIGINT << (idx % 16)) ELSE 0 END)::BIGINT
        |     AS bval
        |  FROM bits GROUP BY doc_id, band),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bv a JOIN bv b ON a.band = b.band AND a.bval = b.bval
        |    AND a.doc_id < b.doc_id),
        |ham AS (SELECT c.id_a, c.id_b,
        |   sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)::INT AS hamming
        |  FROM cand c JOIN bits x ON x.doc_id = c.id_a
        |              JOIN bits y ON y.doc_id = c.id_b AND y.idx = x.idx
        |  GROUP BY c.id_a, c.id_b)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""".stripMargin,

    "q_multimodal_frames" ->
      """WITH b AS (
        | SELECT doc_id, source AS mime,
        |  CASE WHEN length(text) = 0 THEN NULL ELSE
        |   list_reduce(
        |    list_prepend(1::BIGINT,
        |     list_transform(range(1, length(text)+1),
        |      i -> ord(substr(text, i::INT, 1))::BIGINT)),
        |    (a, x) -> ((31*a + x + 2147483648) % 4294967296 + 4294967296)
        |              % 4294967296 - 2147483648)
        |  END AS h
        | FROM documents WHERE doc_id < 200),
        |m AS (
        | SELECT doc_id, mime,
        |  CASE WHEN h IS NULL THEN 0
        |   ELSE abs(CAST(floor(h / 65536.0) AS BIGINT) % 300) + 1 END AS f
        | FROM b),
        |fr AS (
        | SELECT doc_id, mime,
        |  CASE WHEN f >= 1 THEN
        |   CAST(floor((f - 1) / greatest(1, CAST(trunc(f / 4.0) AS BIGINT)))
        |     AS BIGINT) + 1
        |  ELSE 0 END AS nf
        | FROM m)
        |SELECT mime, sum(nf)::BIGINT AS n_frames,
        | count(DISTINCT CASE WHEN nf > 0 THEN doc_id END) AS n_media,
        | 8 AS dim
        |FROM fr GROUP BY mime""".stripMargin,

    "q_dedup_embed" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_dot_product(a.v, b.v)
        |   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS c
        | FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(c, 2) AS c FROM p WHERE c >= 0.35""".stripMargin,

    "q_token_bpe" ->
      s"""SELECT lang,
         | sum(len(regexp_extract_all(text, '$sqlBpePat')))::BIGINT AS n_tokens,
         | count(*) AS n_docs
         |FROM documents GROUP BY lang""".stripMargin,

    "q_fingerprint_chain" ->
      s"""SELECT lang, count(DISTINCT fp) AS n_fp, min(fp) AS min_fp,
         | count(*) AS n
         |FROM (SELECT lang,
         |  list_reduce(list_prepend('', $sqlToks), (acc, t) -> md5(acc || t)) AS fp
         | FROM documents)
         |GROUP BY lang""".stripMargin,

    "q_fingerprint_winnow" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |  list_transform(${sqlShinglesPos(sqlToks)}, s -> md5(s)) AS hs
         | FROM documents),
         |w AS (SELECT doc_id, lang, CASE WHEN len(hs) = 0 THEN []::VARCHAR[]
         |  ELSE list_distinct(list_transform(
         |    range(1, greatest(len(hs) - 4 + 1, 1) + 1),
         |    j -> list_aggregate(list_slice(hs, j, j + 3), 'min'))) END AS fps
         | FROM h)
         |SELECT lang, count(*) AS n_fps, count(DISTINCT fp) AS n_distinct,
         | min(fp) AS min_fp
         |FROM (SELECT lang, unnest(fps) AS fp FROM w)
         |GROUP BY lang""".stripMargin,

    "q_decontaminate" ->
      s"""WITH b AS (SELECT DISTINCT unnest(${sqlShingles(sqlToks)}) AS s
         |  FROM documents WHERE doc_id % 97 = 0),
         |ds AS (SELECT doc_id, unnest(${sqlShingles(sqlToks)}) AS s FROM documents),
         |hits AS (SELECT doc_id, count(*) AS n_contam
         |  FROM ds JOIN b USING (s) GROUP BY doc_id),
         |c AS (SELECT d.lang, coalesce(h.n_contam, 0) AS n_contam
         |  FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id)
         |SELECT lang, count(*) AS n_docs,
         | sum(CASE WHEN n_contam > 0 THEN 1 ELSE 0 END)::BIGINT AS n_contaminated,
         | sum(n_contam)::BIGINT AS sum_overlap,
         | max(n_contam) AS max_overlap
         |FROM c GROUP BY lang""".stripMargin,

    "q_decontaminate_stream" ->
      s"""WITH b AS (SELECT DISTINCT unnest(${sqlShingles(sqlToks)}) AS s
         |  FROM documents WHERE doc_id % 97 = 0),
         |bad AS (SELECT DISTINCT doc_id FROM
         |  (SELECT doc_id, unnest(${sqlShingles(sqlToks)}) AS s
         |   FROM documents) ds JOIN b USING (s))
         |SELECT lang, count(*) AS n_kept, sum(n_chars)::BIGINT AS chars,
         | min(doc_id) AS first_id
         |FROM documents d ANTI JOIN bad USING (doc_id)
         |GROUP BY lang""".stripMargin,

    "q_contamination_report" ->
      s"""WITH bs AS (SELECT doc_id AS bid, unnest(${sqlShingles(sqlToks)}) AS s
         |  FROM documents WHERE doc_id % 97 = 0),
         |hits AS (SELECT s, count(*) AS df
         |  FROM (SELECT unnest(${sqlShingles(sqlToks)}) AS s FROM documents)
         |  WHERE s IN (SELECT DISTINCT s FROM bs)
         |  GROUP BY s)
         |SELECT bid, count(*) AS n_shingles,
         | sum(CASE WHEN hits.df IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |   AS n_leaked,
         | coalesce(sum(hits.df), 0)::BIGINT AS n_doc_hits
         |FROM bs LEFT JOIN hits USING (s)
         |GROUP BY bid""".stripMargin,

    "q_split_train_test" ->
      """SELECT lang,
        | CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
        |  THEN 'train' ELSE 'test' END AS split,
        | count(*) AS n, sum(n_chars)::BIGINT AS chars
        |FROM documents GROUP BY 1, 2""".stripMargin,

    "q_sample_importance" ->
      """SELECT lang, count(*) AS n_kept, sum(n_chars)::BIGINT AS chars_kept,
        | min(doc_id) AS first_id
        |FROM (SELECT *, printf('%04x', least(65535,
        |    CAST(floor(least(1.0, n_chars / 400.0) * 65536) AS INTEGER)))
        |   AS thr
        |  FROM documents)
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < thr
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, count(*) AS n_kept, sum(n_chars)::BIGINT AS chars,
        | min(doc_id) AS first_id
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN '4000' ELSE '199a' END
        |GROUP BY lang""".stripMargin,

    "q_pack_budget" ->
      """WITH t AS (SELECT lang, doc_id,
        |  len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))::BIGINT AS n_tokens
        | FROM documents),
        |p AS (SELECT lang, n_tokens,
        |  ((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
        |   // 4096)::BIGINT AS pack_id
        | FROM t)
        |SELECT lang, count(DISTINCT pack_id) AS n_packs,
        | sum(n_tokens)::BIGINT AS total_tokens, max(pack_id) AS max_pack
        |FROM p GROUP BY lang""".stripMargin,

    "q_df_prune" ->
      """WITH segs AS (SELECT doc_id,
        |  unnest(string_split(text, ' ')) AS seg,
        |  generate_subscripts(string_split(text, ' '), 1) AS pos
        | FROM documents),
        |hot AS (SELECT seg FROM segs GROUP BY seg
        |  HAVING count(DISTINCT doc_id) > 380),
        |kept AS (SELECT s.doc_id, s.seg, s.pos
        |  FROM segs s ANTI JOIN hot h USING (seg))
        |SELECT d.doc_id,
        | coalesce(string_agg(k.seg, ' ' ORDER BY k.pos), '') AS text_pruned,
        | CAST(count(k.seg) AS INT) AS n_kept
        |FROM documents d LEFT JOIN kept k USING (doc_id)
        |GROUP BY d.doc_id""".stripMargin,

    "q_chunk_tokens" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |st AS (SELECT doc_id, t,
        |  unnest(generate_series(1, greatest(len(t), 1), 24)) AS s
        | FROM toks)
        |SELECT doc_id,
        | CAST((s - 1) // 24 AS INT) AS chunk_id,
        | array_to_string(t[s : least(s + 31, len(t))], ' ') AS chunk_text,
        | CAST(least(s + 31, len(t)) - s + 1 AS INT) AS n_tokens
        |FROM st""".stripMargin,

    // every 8-char window hashed with the replayed XXH64 ([[Xxh64Sql]]);
    // boundary where h ≡ 0 (mod 64); chunks re-assembled per doc via
    // lead() over the distinct boundary set prefixed with position 1
    "q_dedup_cdc" ->
      s"""WITH docs8 AS MATERIALIZED (SELECT doc_id, text,
         |  length(text) AS dl FROM documents),
         |w AS MATERIALIZED (SELECT doc_id, g.i AS pos, substr(text, g.i, 8) AS t
         |  FROM docs8, LATERAL (SELECT unnest(generate_series(1, dl - 7)) AS i) g
         |  WHERE dl >= 8),
         |tl AS MATERIALIZED (SELECT t, length(t) AS len
         |  FROM (SELECT DISTINCT t FROM w)),
         |${Xxh64Sql.chain},
         |bnd AS (SELECT doc_id, pos FROM w JOIN hf USING (t) WHERE h % 64 = 0),
         |st AS (SELECT DISTINCT doc_id, pos FROM (
         |  SELECT doc_id, pos FROM bnd
         |  UNION ALL SELECT doc_id, 1 AS pos FROM docs8 WHERE dl >= 1)),
         |ck AS (SELECT s.doc_id, s.pos,
         |  coalesce(lead(s.pos, 1) OVER (
         |    PARTITION BY s.doc_id ORDER BY s.pos), d.dl + 1) AS np, d.text
         | FROM st s JOIN docs8 d USING (doc_id)),
         |chunks AS (SELECT doc_id, substr(text, pos, np - pos) AS chunk FROM ck),
         |g AS (SELECT chunk, count(*) AS cnt, length(chunk) AS len
         |  FROM chunks GROUP BY chunk)
         |SELECT sum(cnt)::BIGINT AS n_chunks, count(*)::BIGINT AS n_distinct,
         |  sum(cnt - 1)::BIGINT AS dup_occ,
         |  sum((cnt - 1) * len)::BIGINT AS dup_chars,
         |  sum(cnt * len)::BIGINT AS total_chars
         |FROM g""".stripMargin,

    // first-occurrence-wins across the ordered batch sequence: a doc
    // survives iff no earlier batch saw its fingerprint and it is the
    // min-id holder of its fingerprint within its own batch
    "q_dedup_incremental" ->
      """WITH f AS (SELECT doc_id, doc_id % 3 AS batch,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        | FROM documents),
        |s AS (SELECT doc_id, batch,
        |  min(batch) OVER (PARTITION BY fp) AS fb,
        |  min(doc_id) OVER (PARTITION BY fp, batch) AS fid
        | FROM f)
        |SELECT doc_id, batch::BIGINT AS batch FROM s
        |WHERE batch = fb AND doc_id = fid AND batch > 0""".stripMargin,

    // live index fps = fps(batches 0,1) minus fps of the tombstoned
    // (doc_id % 5 = 0) docs; batch-2 survivors = fp unseen in the live
    // set AND first (min-id) holder within batch 2
    "q_dedup_tombstone" ->
      """WITH f AS (SELECT doc_id, doc_id % 3 AS batch,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        | FROM documents),
        |live AS (SELECT DISTINCT fp FROM f WHERE batch < 2
        |  AND fp NOT IN (SELECT fp FROM f WHERE batch < 2 AND doc_id % 5 = 0)),
        |b2 AS (SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS fid
        |  FROM f WHERE batch = 2)
        |SELECT doc_id FROM b2
        |WHERE doc_id = fid AND fp NOT IN (SELECT fp FROM live)""".stripMargin,

    // every overlapping 5-token window; dup = not the (doc_id, pos)-first
    // occurrence of its token sequence (row_number > 1 ≡ the Spark side's
    // min(struct) election); gaps-and-islands merge to maximal spans
    "q_dedup_substring" ->
      """WITH t AS (SELECT doc_id,
        |  string_split_regex(lower(trim(text)), '\s+') AS toks
        | FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 5),
        |w AS (SELECT doc_id, g.i - 1 AS pos,
        |  array_to_string(toks[g.i : g.i + 4], ' ') AS kg
        | FROM n, LATERAL (SELECT unnest(generate_series(1, n - 4)) AS i) g),
        |sel AS (SELECT doc_id, pos FROM w QUALIFY
        |  row_number() OVER (PARTITION BY kg ORDER BY doc_id, pos) > 1),
        |brk AS (SELECT doc_id, pos,
        |  CASE WHEN pos > coalesce(lag(pos) OVER (
        |    PARTITION BY doc_id ORDER BY pos), -6) + 5 THEN 1 ELSE 0 END AS b
        | FROM sel),
        |grp AS (SELECT doc_id, pos, sum(b) OVER (
        |  PARTITION BY doc_id ORDER BY pos
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g FROM brk)
        |SELECT doc_id, min(pos)::BIGINT AS span_start,
        | (max(pos) + 4)::BIGINT AS span_end,
        | count(*)::BIGINT AS n_dup_windows
        |FROM grp GROUP BY doc_id, g""".stripMargin,

    // same chunk grid as q_chunk_tokens (stride = size, no overlap);
    // winner per span = row_number 1 over (doc_id, chunk_id) — identical
    // to the Spark side's min(struct) election by span hash
    "q_span_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |st AS (SELECT doc_id, t,
        |  unnest(generate_series(1, greatest(len(t), 1), 32)) AS s
        | FROM toks),
        |c AS (SELECT doc_id,
        |  CAST((s - 1) // 32 AS INT) AS chunk_id,
        |  array_to_string(t[s : least(s + 31, len(t))], ' ') AS chunk_text,
        |  least(s + 31, len(t)) - s + 1 AS n_tokens
        | FROM st),
        |k AS (SELECT *, row_number() OVER (
        |  PARTITION BY chunk_text ORDER BY doc_id, chunk_id) AS rn FROM c),
        |r AS (SELECT doc_id,
        |  string_agg(chunk_text, ' ' ORDER BY chunk_id) AS text_dedup,
        |  count(*) AS n_chunks_kept, sum(n_tokens)::BIGINT AS n_tokens_kept
        | FROM k WHERE rn = 1 GROUP BY doc_id)
        |SELECT lang, count(*) AS n_docs,
        | sum(coalesce(n_chunks_kept, 0))::BIGINT AS chunks_kept,
        | sum(coalesce(n_tokens_kept, 0))::BIGINT AS tokens_kept,
        | sum(length(coalesce(text_dedup, '')))::BIGINT AS chars_kept,
        | sum(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_emptied
        |FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
        |GROUP BY lang""".stripMargin,

    // H = log2 n − (Σ c·log2 c)/n over per-token counts — the groupBy
    // formulation; the Spark side computes the same identity as a
    // per-row run-length fold over the sorted token array
    "q_token_entropy" ->
      s"""WITH cnt AS (SELECT doc_id, lang, count(*) AS c
         |  FROM (SELECT doc_id, lang, unnest($sqlToks) AS tok FROM documents)
         |  GROUP BY doc_id, lang, tok),
         |h AS (SELECT doc_id, lang, sum(c)::DOUBLE AS n,
         |  sum(c * log2(c::DOUBLE)) AS s FROM cnt GROUP BY doc_id, lang),
         |e AS (SELECT lang,
         |  CASE WHEN n <= 0 THEN 0.0 ELSE log2(n) - s / n END AS entropy
         | FROM h)
         |SELECT lang, round(sum(entropy), 2) AS sum_ent,
         | round(max(entropy), 2) AS max_ent, count(*) AS n
         |FROM e GROUP BY lang""".stripMargin,

    // same mixture algebra as Curation.mixToWeights: binding stratum =
    // argmin count/weight (tie-break by key) kept in full ('g' sorts
    // above every hex digest), others at the 4-hex md5 threshold
    "q_mix_weights" ->
      """WITH w(lang, wt) AS (VALUES ('en', 0.5), ('de', 0.3), ('fr', 0.2)),
        |c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |j AS (SELECT c.lang, wt, n FROM c JOIN w USING (lang)),
        |b AS (SELECT lang AS blang, n / wt AS scale FROM j
        |  ORDER BY n / wt, lang LIMIT 1),
        |f AS (SELECT j.lang,
        |  CASE WHEN j.lang = (SELECT blang FROM b) THEN 1.0
        |       ELSE least(1.0, (SELECT scale FROM b) * wt / n) END AS frac
        | FROM j),
        |t AS (SELECT lang, CASE WHEN frac >= 1.0 THEN 'g'
        |  ELSE printf('%04x', least(CAST(round(frac * 65536) AS INT), 65535))
        |  END AS thr FROM f)
        |SELECT d.lang, count(*) AS n_kept, min(d.doc_id) AS first_id,
        | sum(d.n_chars)::BIGINT AS chars
        |FROM documents d JOIN t USING (lang)
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < thr
        |GROUP BY d.lang""".stripMargin,

    // same half-up quantization algebra as Similarity.quantizeInt8
    // (explicit floor(x/s + 0.5) — engine-independent, see SKILL gotcha
    // on round())
    "q_embed_quant" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] AS vd FROM embeddings),
        |q AS (SELECT label, vd,
        |  list_max(list_transform(vd, x -> abs(x))) / 127.0 AS s FROM v),
        |e AS (SELECT label, s,
        |  CASE WHEN s = 0 THEN 0.0 ELSE
        |    list_sum(list_transform(vd, x -> abs(x - floor(x / s + 0.5) * s)))
        |  END AS err
        | FROM q)
        |SELECT label, round(sum(err), 4) AS sum_err,
        | round(max(s), 6) AS max_scale, count(*) AS n
        |FROM e GROUP BY label""".stripMargin,

    "q_perplexity_bigram" ->
      s"""WITH t AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents),
         |bgx AS (SELECT doc_id, lang,
         |   unnest(list_transform(range(1, len(toks)),
         |     i -> struct_pack(w1 := toks[i],
         |       bg := toks[i] || ' ' || toks[i+1]))) AS p
         |  FROM t),
         |b AS (SELECT doc_id, lang, p.w1 AS w1, p.bg AS bg FROM bgx),
         |c2 AS (SELECT bg, count(*) AS c2 FROM b GROUP BY bg),
         |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY w1),
         |vocab AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM
         |  (SELECT unnest(toks) AS w FROM t)),
         |s AS (SELECT doc_id, lang,
         |   log2((c2.c2 + 0.1) / (c1.c1 + 0.1 * v)) AS lp
         |  FROM b JOIN c2 USING (bg) JOIN c1 USING (w1) CROSS JOIN vocab),
         |pd AS (SELECT doc_id, lang, -sum(lp)/count(*) AS h
         |  FROM s GROUP BY 1, 2)
         |SELECT lang, count(*) AS n_docs, round(sum(h), 2) AS sum_h,
         | round(max(h), 2) AS max_h
         |FROM pd GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dedup_rate" ->
      """WITH f AS (SELECT source, md5(text) AS fp FROM documents),
        |c AS (SELECT fp, count(*) AS c FROM f GROUP BY fp)
        |SELECT source, count(*) AS n_docs,
        | sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_duped,
        | round(avg(CASE WHEN c > 1 THEN 1.0 ELSE 0.0 END), 4)
        |   AS dup_rate
        |FROM f JOIN c USING (fp)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_sim_histogram" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 100),
        |p AS (SELECT list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v))
        |       * sqrt(list_dot_product(b.v, b.v))) AS c
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT least(floor(c * 10)::INT, 9) AS bin, count(*) AS n
        |FROM p GROUP BY bin ORDER BY bin""".stripMargin,

    "q_dim_corr" ->
      """SELECT
        | round(corr(embedding[1], embedding[2]), 4) AS c_0_1,
        | round(corr(embedding[1], embedding[3]), 4) AS c_0_2,
        | round(corr(embedding[1], embedding[4]), 4) AS c_0_3,
        | round(corr(embedding[2], embedding[3]), 4) AS c_1_2,
        | round(corr(embedding[2], embedding[4]), 4) AS c_1_3,
        | round(corr(embedding[3], embedding[4]), 4) AS c_2_3
        |FROM embeddings""".stripMargin,

    "q_semdedup" ->
      s"""WITH $kmeansNvPrefix,
         |${kmeansSqlChain(8, 2)},
         |drops AS (SELECT DISTINCT b.vec_id AS id_b
         |  FROM af a JOIN af b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |   AND list_dot_product(a.nv, b.nv) >= 0.35),
         |kept AS (SELECT vec_id, cluster FROM af
         |  WHERE vec_id NOT IN (SELECT id_b FROM drops))
         |SELECT cluster, count(*) AS n_kept, min(vec_id) AS first_id,
         | sum(vec_id)::BIGINT AS sum_ids
         |FROM kept GROUP BY cluster ORDER BY cluster""".stripMargin,

    "q_random_proj" ->
      s"""WITH sgn(pos, s) AS (VALUES ${rpSignRows(16, 64, 42L)}),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings)
         |SELECT vec_id, pos,
         | round(list_dot_product(vd, s::DOUBLE[]) * 0.25, 4) + 0.0 AS p_r
         |FROM v CROSS JOIN sgn""".stripMargin,

    "q_centroids" ->
      """WITH e AS (SELECT label, unnest(embedding::DOUBLE[]) AS v,
        |    generate_subscripts(embedding, 1) - 1 AS pos FROM embeddings)
        |SELECT label, pos, round(avg(v), 4) + 0.0 AS c_r, count(*) AS n
        |FROM e GROUP BY label, pos""".stripMargin,

    "q_repetition" ->
      s"""WITH r AS (SELECT lang,
         |  CASE WHEN len(shp) = 0 THEN 0.0
         |   ELSE 1.0 - len(list_distinct(shp))::DOUBLE / len(shp)::DOUBLE END AS rep
         | FROM (SELECT lang, ${sqlShinglesPos(sqlToks)} AS shp FROM documents))
         |SELECT lang, round(sum(rep), 2) AS sum_rep, round(max(rep), 2) AS max_rep,
         | count(*) AS n
         |FROM r GROUP BY lang""".stripMargin,

    "q_gopher_rules" ->
      s"""WITH t AS (SELECT lang, $sqlToks AS toks FROM documents),
         |m AS (SELECT lang, len(toks) AS n,
         |  CASE WHEN len(toks)=0 THEN 0 ELSE
         |   list_sum(list_transform(toks, x -> length(x)))::DOUBLE
         |    / len(toks) END AS mean_len,
         |  CASE WHEN len(toks)=0 THEN 0 ELSE
         |   len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
         |    / len(toks) END AS alpha_frac,
         |  len(list_intersect(list_distinct(toks),
         |    ['the','be','to','of','and','that','have','with'])) AS stop_hits
         | FROM t),
         |f AS (SELECT lang, mean_len, alpha_frac, stop_hits,
         |  n BETWEEN 50 AND 100000 AS ok_words,
         |  mean_len BETWEEN 3.0 AND 10.0 AS ok_mean_len,
         |  alpha_frac >= 0.8 AS ok_alpha,
         |  stop_hits >= 2 AS ok_stop
         | FROM m)
         |SELECT lang, count(*) AS n_docs,
         | sum(CASE WHEN ok_words AND ok_mean_len AND ok_alpha AND ok_stop
         |     THEN 1 ELSE 0 END)::BIGINT AS n_pass,
         | sum(CASE WHEN ok_words THEN 0 ELSE 1 END)::BIGINT AS rej_words,
         | sum(CASE WHEN ok_mean_len THEN 0 ELSE 1 END)::BIGINT
         |   AS rej_mean_len,
         | sum(CASE WHEN ok_alpha THEN 0 ELSE 1 END)::BIGINT AS rej_alpha,
         | sum(CASE WHEN ok_stop THEN 0 ELSE 1 END)::BIGINT AS rej_stop,
         | round(avg(mean_len), 4) AS avg_wlen,
         | round(avg(alpha_frac), 4) AS avg_alpha,
         | sum(stop_hits)::BIGINT AS stop_hits
         |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    "q_quality_filter" ->
      s"""WITH t AS (SELECT lang, n_chars, $sqlToks AS toks FROM documents),
         |q AS (SELECT lang, n_chars,
         |  len(toks) AS n_toks,
         |  CASE WHEN len(toks)=0 THEN 0 ELSE
         |   list_sum(list_transform(toks, x -> length(x)))::DOUBLE
         |    / len(toks)::DOUBLE END AS mean_len,
         |  CASE WHEN len(toks)=0 THEN 0 ELSE
         |   len(list_filter(toks, x -> x IN ('the','a','of','and')))::DOUBLE
         |    / len(toks)::DOUBLE END AS sw_ratio
         | FROM t)
         |SELECT lang, count(*) AS n_kept, sum(n_chars)::BIGINT AS chars
         |FROM q
         |WHERE n_toks BETWEEN 10 AND 1000 AND mean_len < 12.0 AND sw_ratio < 0.5
         |GROUP BY lang""".stripMargin
  )

  /** q_sim_ivfpq_serve probes the SAME deterministic training chain
    * against the pre-built index, so its result multiset is
    * q_sim_ivfpq_refine's by construction — the oracle is shared, the
    * way q_sim_lsh_persisted shares lshTopKOracleSql. */
  val oracle: Map[String, String] =
    oracleBase +
      ("q_sim_ivfpq_serve" -> oracleBase("q_sim_ivfpq_refine")) +
      // identical result by exact recall under any segmentation — the
      // persisted-index probe shares the composite's oracle
      ("q_fuzzy_link_serve" -> oracleBase("q_fuzzy_link2"))
}
