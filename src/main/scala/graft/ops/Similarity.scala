package graft.ops

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`)
  * (SURVEY.md §2.3 north-star "Near-dup / similarity" row).
  *
  * Two paths, mirroring how a 100 TB corpus is actually searched:
  *   - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast
  *     (it must be small); the corpus side streams through one narrow pass
  *     plus a per-query top-k window. Baseline + oracle-checkable.
  *   - [[lshTopK]]: random-hyperplane LSH. Corpus and queries get a
  *     signature bucket; candidates come from an equi-join on the bucket
  *     (optionally multi-probe over `probes` sign-flip neighbors), then
  *     exact cosine re-ranks the candidates. Corpus signatures are a
  *     narrow map — at scale you'd persist them as a bucketed table so
  *     repeated queries shuffle nothing.
  */
object Similarity {

  /** Exact top-k neighbors by cosine for each query row.
    * queries/corpus: (idCol, vecCol). Output: q_id, rnk, n_id, sim. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosineN(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "sim")
  }

  /** Approximate top-k via random-hyperplane bucketing + exact re-rank.
    *
    * OR-construction over `tables` independent signature tables (recall
    * compounds per table), AND-construction inside each table (`bits`
    * hyperplanes → 2^bits buckets, precision), plus optional multi-probe
    * (`probes` single-bit-flip neighbor buckets per table). Bucket ids are
    * namespaced by table index so the candidate join stays one equi-join.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int,
      bits: Int = 8, tables: Int = 4, probes: Int = 0,
      seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      explode(lshBuckets(col(vecCol), bits, dim, tables, 0, seed)).as("bucket"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      explode(lshBuckets(col(vecCol), bits, dim, tables, probes, seed)).as("bucket"))
    lshRerank(broadcast(q).join(c, "bucket"), k)
  }

  /** bucket = (table index) * 2^bits + signature-in-table; `probes` extra
    * single-bit-flip neighbor buckets per table (multi-probe, query side
    * only). Namespacing by table keeps the OR-construction one equi-join. */
  private def lshBuckets(v: org.apache.spark.sql.Column, bits: Int,
      dim: Int, tables: Int, probes: Int, seed: Long) = {
    val all = (0 until tables).flatMap { t =>
      val sig = hyperplaneSig(v, bits, dim, seed + t)
      val base = lit(t.toLong * (1L << bits)) + sig
      base +: (0 until probes).map(i =>
        lit(t.toLong * (1L << bits)) + sig.bitwiseXOR(lit(1L << i)))
    }
    array(all: _*)
  }

  /** Candidate → result: exact cosine re-rank, dedup across tables/probes,
    * per-query top-k as a heap (WindowGroupLimit). */
  private def lshRerank(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    cand
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosineN(col("qv"), col("nv")))
      .select("q_id", "n_id", "sim").distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "sim")
  }

  /** [[lshTopK]] for query batches too large to broadcast: both sides
    * shuffle on bucket and sort-merge join. This is the from-scratch
    * alternative in the large-batch regime — the corpus signature pass
    * AND its bucket shuffle are paid on every batch, which is exactly
    * the recurring cost [[lshIndexBuild]]+[[lshIndexProbe]] amortize
    * into the one-time bucketed write (IndexBench measures the gap). */
  def lshTopKLargeBatch(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int,
      bits: Int = 8, tables: Int = 4, probes: Int = 0,
      seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      explode(lshBuckets(col(vecCol), bits, dim, tables, 0, seed)).as("bucket"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      explode(lshBuckets(col(vecCol), bits, dim, tables, probes, seed)).as("bucket"))
    lshRerank(c.join(q.hint("shuffle_merge"), "bucket"), k)
  }

  /** Persist the corpus side of [[lshTopK]] as a bucketed table — the
    * "corpus signatures as a bucketed table" scale path the lshTopK doc
    * promises. The one-time write materializes every vector's
    * (bucket, id, vector) rows bucketed BY the LSH bucket id, so each
    * subsequent probe batch joins against it with ZERO Exchange on the
    * corpus side (pinned in LayoutBucketingSpec): at 100 TB the corpus
    * signature shuffle — the dominant per-query cost once query batches
    * are too big to broadcast — is paid once per index build, not once
    * per probe. `sortBy(bucket)` additionally makes each bucket file
    * merge-ready, so the probe join's corpus side needs no sort pass
    * of its own beyond the per-file merge. */
  def lshIndexBuild(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, tableName: String, tableBuckets: Int = 32,
      bits: Int = 8, tables: Int = 4, seed: Long = 42L,
      metaCols: Seq[String] = Nil): Unit = {
    val sig = corpus.select(Seq(col(idCol).as("n_id"), col(vecCol).as("nv"),
      explode(lshBuckets(col(vecCol), bits, dim, tables, 0, seed))
        .as("bucket")) ++ metaCols.map(col): _*)
    // empty tombstone table up front: discards a previous same-name
    // index's deletes and makes mid-stream deletes visible to streaming
    // probes (Bucketing.initTombstones)
    Bucketing.initTombstones(sig, "n_id", tableName)
    Bucketing.writeBucketed(Bucketing.withGen(sig, 0L),
      tableName, "bucket", tableBuckets)
  }

  /** Incrementally extend a [[lshIndexBuild]] table with a new corpus
    * batch (same bits/tables/seed as the build!): signatures of the new
    * vectors append as one file per touched bucket — the index write is
    * proportional to the DELTA, not the corpus, and probes keep their
    * zero-corpus-Exchange shape (LayoutBucketingSpec pins build+append ≡
    * one full build). */
  def lshIndexAppend(newCorpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, tableName: String, tableBuckets: Int = 32,
      bits: Int = 8, tables: Int = 4, seed: Long = 42L,
      metaCols: Seq[String] = Nil): Unit = {
    val sig = newCorpus.select(Seq(col(idCol).as("n_id"), col(vecCol).as("nv"),
      explode(lshBuckets(col(vecCol), bits, dim, tables, 0, seed))
        .as("bucket")) ++ metaCols.map(col): _*)
    // stamped with the index's current generation: a deleted-then-
    // re-appended vector id is live again from this append on (its
    // stale pre-delete signatures stay suppressed), and the append is a
    // pure file write — safe under a running streaming probe
    Bucketing.appendBucketed(
      Bucketing.withGen(sig,
        Bucketing.currentGen(newCorpus.sparkSession, tableName)),
      tableName, "bucket", tableBuckets)
  }

  /** Tombstone RETRACTION for a [[lshIndexBuild]] table (r15): vector
    * ids to retract accumulate in a small `<tableName>_del` side table;
    * probes anti-join it ([[liveLshIndex]]) and [[lshIndexCompact]]
    * folds it into the base — no per-delete index rewrite, mirroring
    * [[Dedup.fingerprintIndexDelete]]. A deleted id's signatures vanish
    * from every band table at probe time:
    * probe(build(A) ∪ append(B) − delete(D)) ≡ probe(build(A∪B−D)),
    * spec-pinned in DedupSimilaritySpec. */
  def lshIndexDelete(delIds: DataFrame, idCol: String,
      tableName: String): Unit =
    Bucketing.tombstoneAppend(delIds.select(col(idCol).as("n_id")),
      "n_id", tableName)

  /** The LIVE rows of an LSH index: base minus tombstoned vector ids —
    * [[Bucketing.liveView]] keyed by `n_id` (the vector id, so one
    * delete removes the id's signature row in every band table). */
  def liveLshIndex(spark: SparkSession, tableName: String): DataFrame =
    Bucketing.liveView(spark, tableName, "n_id")

  /** Fold tombstones into the base: rewrite the index to its live rows
    * (one file per bucket) and truncate the delete table. Probe results
    * unchanged by construction. Returns the live signature-row count. */
  def lshIndexCompact(spark: SparkSession, tableName: String,
      tableBuckets: Int = 32): Long =
    Bucketing.tombstoneCompact(spark, tableName, "n_id", "bucket",
      tableBuckets)

  /** Probe a [[lshIndexBuild]] table: bucket the query batch with the
    * SAME (bits, tables, seed) plus multi-probes, equi-join on bucket,
    * exact-cosine re-rank. Result multiset is identical to [[lshTopK]]
    * with the same parameters (the oracle surface). The shuffle_merge
    * hint steers the join to sort-merge so the bucketed corpus scan's
    * output partitioning is consumed directly — only the (small) query
    * side exchanges, regardless of corpus size. */
  def lshIndexProbe(spark: SparkSession, tableName: String,
      queries: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
      bits: Int = 8, tables: Int = 4, probes: Int = 0,
      seed: Long = 42L,
      corpusFilter: Option[Column] = None): DataFrame = {
    // FILTERED vector search: the metadata predicate (over metaCols the
    // build embedded in the index) lands as a parquet PushedFilter on
    // the bucketed scan — pre-filtering, not post-filtering the top-k,
    // so a selective predicate cannot starve the result the way
    // filter-after-rank does. Identical to probing an index built over
    // the pre-filtered corpus (bucketing is per-row — DedupSimilaritySpec
    // pins it).
    val c = corpusFilter.foldLeft(liveLshIndex(spark, tableName))(
      (t, f) => t.filter(f))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      explode(lshBuckets(col(vecCol), bits, dim, tables, probes, seed)).as("bucket"))
    lshRerank(c.join(q.hint("shuffle_merge"), "bucket"), k)
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key: all
    * (id_a < id_b) pairs in the same block with cosine >= threshold.
    * The block join is the recall/throughput dial — at 100 TB the block
    * would be an LSH bucket (see [[lshTopK]]'s signatures) or a coarse
    * IVF centroid id rather than a metadata column; semantics stay
    * identical, which is why this exact variant is the oracle surface. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    // Pre-normalize per row (not per pair): each pair then costs one dot
    // product instead of dot + 2 norms. The norm goes through a
    // materialization barrier so it is computed once, not once per element
    // of the normalizing transform (see Transforms.materialized).
    val t0 = df.select(col(blockCol).as("blk"), col(idCol).as("id"), col(vecCol).as("v"))
    val t = graft.core.Transforms.materialized(t0, "nrm", normD(col("v")))
      .select(col("blk"), col("id"),
        when(col("nrm") === 0, transform(col("v"), x => x.cast("double") * 0.0))
          .otherwise(transform(col("v"), x => x.cast("double") / col("nrm"))).as("vn"))
    val l = t.select(col("blk"), col("id").as("id_a"), col("vn").as("vn_a"))
    val r = t.select(col("blk"), col("id").as("id_b"), col("vn").as("vn_b"))
    l.join(r, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dotN(col("vn_a"), col("vn_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** IVF-style ANN: k-means-free variant where the "centroids" are a
    * deterministic coarse quantization — each vector is assigned to the
    * bucket of its dominant dimension (argmax |v_i| over the first
    * `nlist` dims, sign-split). Queries probe their own cell plus
    * `nprobe-1` runner-up cells, then exact cosine re-ranks. The inverted
    * file (cell → vectors) is the scale structure: at 100 TB it is a
    * bucketed/partitioned table so a query touches nprobe partitions, not
    * the corpus. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 32, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      explode(ivfCells(col(vecCol), nlist, 1)).as("cell"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      explode(ivfCells(col(vecCol), nlist, nprobe)).as("cell"))
    lshRerank(broadcast(q).join(c, "cell"), k)
  }

  /** cell of rank r: the dimension index (within the first nlist dims)
    * with the r-th largest |value|, sign-encoded → 2·nlist cells. */
  private def ivfCells(v: org.apache.spark.sql.Column, nlist: Int, n: Int) = {
    val head = slice(v, 1, nlist)
    val ranked = array_sort(
      zip_with(head, sequence(lit(0), lit(nlist - 1)), (x, i) =>
        struct(abs(x).as("a"), x.as("x"), i.as("i"))),
      (a, b) => when(a("a") > b("a"), -1).when(a("a") < b("a"), 1)
        .otherwise(when(a("i") < b("i"), -1).otherwise(1)))
    transform(slice(ranked, 1, n), s =>
      s("i") * 2 + when(s("x") >= 0, 0).otherwise(1))
  }

  /** Persist the IVF inverted file (cell → vectors) as a table bucketed
    * by cell — the "at 100 TB it is a bucketed/partitioned table" path
    * of [[ivfTopK]]'s doc, same amortization as [[lshIndexBuild]]:
    * repeated probe batches touch nprobe cells of a co-located layout
    * and never re-shuffle the corpus. */
  def ivfIndexBuild(corpus: DataFrame, idCol: String, vecCol: String,
      tableName: String, tableBuckets: Int = 32, nlist: Int = 32,
      metaCols: Seq[String] = Nil): Unit = {
    val inv = corpus.select(Seq(col(idCol).as("n_id"), col(vecCol).as("nv"),
      explode(ivfCells(col(vecCol), nlist, 1)).as("cell")) ++
      metaCols.map(col): _*)
    // the raw inverted file joins the persisted family's retraction
    // lifecycle, keyed by the vector id (same as the LSH/IVFADC tables)
    Bucketing.initTombstones(inv, "n_id", tableName)
    Bucketing.writeBucketed(Bucketing.withGen(inv, 0L),
      tableName, "cell", tableBuckets)
  }

  /** Tombstone RETRACTION for an [[ivfIndexBuild]] table (r16 — the raw
    * inverted file was the last vector index without it): a deleted
    * vector id stops surfacing from the next [[ivfIndexProbe]] on;
    * [[ivfIndexCompact]] folds. */
  def ivfIndexDelete(delIds: DataFrame, idCol: String,
      tableName: String): Unit =
    Bucketing.tombstoneAppend(delIds.select(col(idCol).as("n_id")),
      "n_id", tableName)

  /** Fold tombstones into the inverted file (live rows, one file per
    * cell bucket, `_del` truncated). Returns the live row count. */
  def ivfIndexCompact(spark: SparkSession, tableName: String,
      tableBuckets: Int = 32): Long =
    Bucketing.tombstoneCompact(spark, tableName, "n_id", "cell",
      tableBuckets)

  /** Probe an [[ivfIndexBuild]] table (same nlist!): identical result
    * multiset to [[ivfTopK]]; only the query batch exchanges on cell.
    * `corpusFilter` (over build-time metaCols) is the filtered-search
    * path, same contract as [[lshIndexProbe]]: a parquet PushedFilter
    * pre-filters the inverted file before candidates form. */
  def ivfIndexProbe(spark: SparkSession, tableName: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nlist: Int = 32, nprobe: Int = 4,
      corpusFilter: Option[Column] = None): DataFrame = {
    val c = corpusFilter.foldLeft(
      Bucketing.liveView(spark, tableName, "n_id"))((t, f) => t.filter(f))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      explode(ivfCells(col(vecCol), nlist, nprobe)).as("cell"))
    lshRerank(c.join(q.hint("shuffle_merge"), "cell"), k)
  }

  /** The per-query L2 ADC table: element j of the outer array is
    * subspace j's table — squared L2 distance from the query's j-th
    * subvector to each codeword, the same left-to-right (x−y)² fold the
    * codebook oracles replay (and [[graft.plans.VectorKernelRule]]
    * rewrites to the `graft_l2` codegen kernel). */
  private def adcL2Tables(vecCol: String,
      codebooks: Array[Array[Seq[Double]]]): Column =
    adcTablesCol(col(vecCol), codebooks, squared = true)

  /** All ADC tables in ONE [[graft.functions.AdcTables]] kernel call
    * (r19, verdict item 2): the codebooks ride as a flat double[]
    * codegen reference object instead of m O(k·sub) array literals with
    * a zip_with/aggregate tree each — constant-size plan, one loop nest
    * per row. Bit-equal to the HOF formulation ([[adcTablesHof]], the
    * spec-pinned twin). */
  private[graft] def adcTablesCol(v: Column,
      codebooks: Array[Array[Seq[Double]]], squared: Boolean): Column = {
    val m = codebooks.length
    val dim = codebooks.map(_.head.length).sum
    val sub = dim / m
    call_function("graft_adc_tables", v,
      typedLit(codebooks.flatten.flatten.toIndexedSeq),
      typedLit(codebooks.map(_.length).toIndexedSeq),
      lit(sub), lit(squared))
  }

  /** The pre-kernel HOF formulation of the ADC tables. Kept as the
    * independent twin the spec pins [[graft.functions.AdcTables]]
    * bit-equal against. */
  private[graft] def adcTablesHof(v: Column,
      codebooks: Array[Array[Seq[Double]]], squared: Boolean): Column = {
    val m = codebooks.length
    val dim = codebooks.map(_.head.length).sum
    val sub = dim / m
    array((0 until m).map { j =>
      val cbLit = typedLit(codebooks(j).map(_.toIndexedSeq).toIndexedSeq)
      val subV = transform(slice(v, j * sub + 1, sub), _.cast("double"))
      transform(cbLit, c => aggregate(
        zip_with(subV, c,
          (x, y) => if (squared) (x - y) * (x - y) else x * y),
        lit(0.0), (a, x) => a + x))
    }: _*)
  }

  /** Σ over subspaces of the candidate's code lookups in `_tab` — the
    * ADC approximation of |query − candidate|². */
  private def adcL2Dist(m: Int, codeCol: String): Column =
    (0 until m).map(j =>
        element_at(element_at(col("_tab"), j + 1),
          element_at(col(codeCol), j + 1) + 1))
      .reduce(_ + _)

  /** Exact-ADC (full-scan) L2 top-k over PQ codes — [[pqTopK]]'s
    * distance-metric sibling and the recall baseline for [[ivfPqProbe]]:
    * every corpus code is scored (m table lookups), smallest approximate
    * |q−x|² wins. Output: (q_id, rnk, n_id, dist_adc). */
  def pqTopKL2(queries: DataFrame, corpusCodes: DataFrame,
      codebooks: Array[Array[Seq[Double]]], idCol: String, vecCol: String,
      codeIdCol: String, codeCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
      adcL2Tables(vecCol, codebooks).as("_tab"))
    val scored = corpusCodes
      .select(col(codeIdCol).as("n_id"), col(codeCol).as("_code"))
      .crossJoin(broadcast(q))
      .withColumn("dist_adc", adcL2Dist(codebooks.length, "_code"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("dist_adc").asc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "dist_adc")
  }

  /** The query side's nprobe coarse cells: rank ALL k centroid scores
    * (x·c_j − |c_j|²/2, the L2 assignment score — argmax ≡ argmin
    * |x−c_j|²) descending with ties to the lower index, keep the first
    * nprobe indices. The centroid matrix is a bounded literal; the whole
    * thing is one narrow HOF projection. */
  private def coarseProbeCells(v: Column, cents: Array[Seq[Double]],
      nprobe: Int): Column =
    // the [[graft.functions.CentroidTopK]] codegen kernel (r19 — the
    // last zip_with-over-centroid-literal tree in the IVFADC probes);
    // bit-equal to [[coarseProbeCellsHof]], the spec-pinned twin
    call_function("graft_centroid_topk",
      transform(v, _.cast("double")),
      typedLit(cents.flatten.toIndexedSeq),
      typedLit(centroidBias(cents, cosine = false).toIndexedSeq),
      lit(nprobe))

  /** The pre-kernel HOF formulation of the coarse-cell ranking. Kept as
    * the independent twin the spec pins [[graft.functions.CentroidTopK]]
    * bit-equal against. */
  private[graft] def coarseProbeCellsHof(v: Column, cents: Array[Seq[Double]],
      nprobe: Int): Column = {
    val centsLit = typedLit(cents.map(_.toIndexedSeq).toIndexedSeq)
    val bias = typedLit(centroidBias(cents, cosine = false).toIndexedSeq)
    val vd = transform(v, _.cast("double"))
    val scored = zip_with(centsLit, sequence(lit(0), lit(cents.length - 1)),
      (c, j) => struct(
        (aggregate(zip_with(vd, c, (x, y) => x * y),
          lit(0.0), (a, x) => a + x) - element_at(bias, j + 1)).as("s"),
        j.as("j")))
    val sorted = array_sort(scored, (a, b) =>
      when(a("s") > b("s"), -1).when(a("s") < b("s"), 1)
        .otherwise(when(a("j") < b("j"), -1).otherwise(1)))
    transform(slice(sorted, 1, nprobe), s => s("j"))
  }

  /** `v − c[cell]`: the residual of a vector against its coarse
    * centroid, with the centroid matrix riding as a 2-D literal indexed
    * by the (computed) cell column. */
  private def residualCol(vec: Column, cellCol: Column,
      cents: Array[Seq[Double]]): Column =
    // the [[graft.functions.CoarseResidual]] codegen kernel (r19 — the
    // last zip_with-over-centroid-literal node in the IVFADC plans);
    // bit-equal to [[residualColHof]], the spec-pinned twin
    call_function("graft_residual", transform(vec, _.cast("double")),
      cellCol.cast("int"), typedLit(cents.flatten.toIndexedSeq),
      lit(cents.length))

  /** The pre-kernel HOF formulation of the coarse residual. Kept as the
    * independent twin the spec pins [[graft.functions.CoarseResidual]]
    * bit-equal against. */
  private[graft] def residualColHof(vec: Column, cellCol: Column,
      cents: Array[Seq[Double]]): Column = {
    val centsLit = typedLit(cents.map(_.toIndexedSeq).toIndexedSeq)
    zip_with(transform(vec, _.cast("double")),
      element_at(centsLit, cellCol + 1), (x, c) => x - c)
  }

  /** Cell assignment under the raw-L2 coarse quantizer — the
    * [[graft.functions.CentroidArgmax]] codegen kernel. */
  private def coarseCell(vec: Column, cents: Array[Seq[Double]]): Column =
    call_function("graft_centroid_argmax",
      transform(vec, _.cast("double")),
      typedLit(cents.flatten.toIndexedSeq),
      typedLit(centroidBias(cents, cosine = false).toIndexedSeq))

  /** RESIDUAL IVFADC index build — the canonical (FAISS-style) refinement
    * of [[ivfPqIndexBuild]]: PQ codebooks are trained on, and codes
    * encode, the RESIDUAL `x − c[cell(x)]` instead of the raw vector.
    * Residual magnitudes are much smaller than vector magnitudes once the
    * coarse quantizer has soaked up the cell mean, so the same m×k code
    * budget spends its resolution on the part that actually
    * differentiates neighbors within a cell — better ADC fidelity at
    * identical index bytes. Returns the trained residual codebooks (the
    * probe needs them); rows (cell, n_id, pq_code) bucketed by cell as
    * before. */
  def ivfPqResidualIndexBuild(corpus: DataFrame, idCol: String,
      vecCol: String, coarseCents: Array[Seq[Double]], m: Int, k: Int,
      iters: Int, tableName: String,
      tableBuckets: Int = 32): Array[Array[Seq[Double]]] = {
    val withRes = corpus
      .withColumn("_cell", coarseCell(col(vecCol), coarseCents))
      .withColumn("_res", residualCol(col(vecCol), col("_cell"), coarseCents))
    val codebooks = pqTrain(withRes, idCol, "_res", m, k, iters)
    val coded = pqEncode(withRes, "_res", codebooks)
      .select(col(idCol).as("n_id"), col("pq_code"), col("_cell").as("cell"))
    // same retraction lifecycle as ivfPqIndexBuild (shared _del keyed
    // by n_id; ivfPqIndexDelete/ivfPqIndexCompact work on both)
    Bucketing.initTombstones(coded, "n_id", tableName)
    Bucketing.writeBucketed(Bucketing.withGen(coded, 0L),
      tableName, "cell", tableBuckets)
    codebooks
  }

  /** The L2 ADC table over an arbitrary residual COLUMN (vs
    * [[adcL2Tables]]' named raw column): element j = squared L2 from the
    * residual's j-th subvector to each codeword, same left-to-right
    * (x−y)² fold. */
  private def adcL2TablesOf(res: Column,
      codebooks: Array[Array[Seq[Double]]]): Column =
    adcTablesCol(res, codebooks, squared = true)

  /** RESIDUAL IVFADC probe: the query explodes to its nprobe coarse
    * cells and carries a PER-CELL ADC table — distances are between the
    * query's residual against THAT cell and the candidate's residual
    * codewords, i.e. |（q−c) − pq(x−c)|² ≈ |q−x|². Same plan shape as
    * [[ivfPqProbe]] (bucketed inverted file, zero corpus-side Exchange,
    * WindowGroupLimit top-k); the query side just computes nprobe m×k
    * tables instead of one. Output: (q_id, rnk, n_id, dist_adc). */
  def ivfPqResidualProbe(spark: SparkSession, tableName: String,
      queries: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Seq[Double]]], coarseCents: Array[Seq[Double]],
      k: Int, nprobe: Int = 3): DataFrame = {
    val q = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("_qv"),
        explode(coarseProbeCells(col(vecCol), coarseCents, nprobe)).as("cell"))
      .withColumn("_tab", adcL2TablesOf(
        residualCol(col("_qv"), col("cell"), coarseCents), codebooks))
      .drop("_qv")
    val scored = liveIvfPqIndex(spark, tableName)
      .join(q.hint("shuffle_merge"), "cell")
      .withColumn("dist_adc", adcL2Dist(codebooks.length, "pq_code"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("dist_adc").asc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "dist_adc")
  }

  /** Exhaustive residual-ADC top-k — [[ivfPqResidualProbe]]'s recall
    * baseline: EVERY corpus code is scored against the query residual
    * for the candidate's OWN cell (the per-cell tables are
    * k_coarse·m·k doubles per query — bounded literals' worth of work,
    * computed once per query row and broadcast). */
  def pqResidualTopKL2(queries: DataFrame, corpusCodes: DataFrame,
      codebooks: Array[Array[Seq[Double]]], coarseCents: Array[Seq[Double]],
      idCol: String, vecCol: String, codeIdCol: String, codeCol: String,
      cellCol: String, k: Int): DataFrame = {
    val nCells = coarseCents.length
    // tabs[cell][subspace][codeword] for every coarse cell
    val tabs = array((0 until nCells).map { cell =>
      adcL2TablesOf(residualCol(col(vecCol), lit(cell), coarseCents), codebooks)
    }: _*)
    val q = queries.select(col(idCol).as("q_id"), tabs.as("_tabs"))
    val scored = corpusCodes
      .select(col(codeIdCol).as("n_id"), col(codeCol).as("_code"),
        col(cellCol).as("_cell"))
      .crossJoin(broadcast(q))
      .withColumn("_tab", element_at(col("_tabs"), col("_cell") + 1))
      .withColumn("dist_adc", adcL2Dist(codebooks.length, "_code"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("dist_adc").asc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "dist_adc")
  }

  /** IVFADC index build — the canonical large-corpus ANN serving shape,
    * composing structures this file already owns: a COARSE k-means
    * quantizer (raw-L2 [[kmeans]] centroids, the same codebook-training
    * mode PQ uses) partitions the corpus into cells, and the inverted
    * file holds PQ CODES ([[pqEncode]]) instead of raw vectors — rows
    * (cell, n_id, pq_code) written as a cell-bucketed table. m small
    * ints per corpus vector instead of dim floats, AND a probe touches
    * nprobe cells instead of the corpus: the two at-scale savings
    * multiply. Cell assignment is the [[graft.functions.CentroidArgmax]]
    * codegen kernel against the broadcast-literal centroid matrix. */
  /** The shared IVFADC row projection: PQ-encode + raw-L2 coarse-cell
    * assignment. Build and append MUST use the identical projection —
    * a drift (e.g. a flipped cosine flag on one side) would silently
    * write appended rows into wrong cells and bleed probe recall. */
  private def ivfPqCoded(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Seq[Double]]],
      coarseCents: Array[Seq[Double]]): DataFrame =
    pqEncode(corpus, vecCol, codebooks)
      .select(col(idCol).as("n_id"), col("pq_code"),
        call_function("graft_centroid_argmax",
          transform(col(vecCol), _.cast("double")),
          typedLit(coarseCents.flatten.toIndexedSeq),
          typedLit(centroidBias(coarseCents, cosine = false).toIndexedSeq))
          .as("cell"))

  def ivfPqIndexBuild(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Seq[Double]]], coarseCents: Array[Seq[Double]],
      tableName: String, tableBuckets: Int = 32): Unit = {
    val coded = ivfPqCoded(corpus, idCol, vecCol, codebooks, coarseCents)
    // empty tombstone table up front (Bucketing.initTombstones): the
    // code table joins the persisted family's retraction lifecycle —
    // the tombstone key is the VECTOR ID, not the cell (one n_id lives
    // in exactly one cell here, but the id is what a caller retracts)
    Bucketing.initTombstones(coded, "n_id", tableName)
    Bucketing.writeBucketed(Bucketing.withGen(coded, 0L),
      tableName, "cell", tableBuckets)
  }

  /** Tombstone RETRACTION for an [[ivfPqIndexBuild]] /
    * [[ivfPqResidualIndexBuild]] code table (r16 — the last
    * append-only persisted index): retracted vector ids accumulate as
    * (n_id, seq) rows in the small `<tableName>_del` side table;
    * [[ivfPqProbe]] / [[ivfPqResidualProbe]] / [[ivfPqMatchStream]]
    * read the live view, so a deleted id stops surfacing as a neighbor
    * from the next probe (or micro-batch) on, with zero corpus-side
    * Exchange preserved, and [[ivfPqIndexCompact]] folds the deletes
    * into the base. probe(build ∪ append − delete) ≡ probe(rebuilt
    * over the survivors) — spec-pinned in DedupSimilaritySpec. */
  def ivfPqIndexDelete(delIds: DataFrame, idCol: String,
      tableName: String): Unit =
    Bucketing.tombstoneAppend(delIds.select(col(idCol).as("n_id")),
      "n_id", tableName)

  /** The LIVE rows of an IVFADC code table — [[Bucketing.liveView]]
    * keyed by `n_id`. */
  def liveIvfPqIndex(spark: SparkSession, tableName: String): DataFrame =
    Bucketing.liveView(spark, tableName, "n_id")

  /** Fold tombstones into the base code table (rewrite to live rows,
    * one file per cell bucket, truncate `_del`). Returns the live code
    * row count. */
  def ivfPqIndexCompact(spark: SparkSession, tableName: String,
      tableBuckets: Int = 32): Long =
    Bucketing.tombstoneCompact(spark, tableName, "n_id", "cell",
      tableBuckets)

  /** IVFADC probe over an [[ivfPqIndexBuild]] table (same centroids and
    * codebooks!): each query carries its precomputed m×k L2 ADC table
    * ([[pqTopK]]'s trick) AND explodes to its [[coarseProbeCells]]; the
    * equi-join on cell against the bucketed inverted file leaves the
    * corpus side Exchange-free, scoring a candidate is m array lookups,
    * and the per-query top-k reduces map-side via WindowGroupLimit. A
    * corpus row lives in exactly ONE cell and probe cells are distinct,
    * so a (query, candidate) pair meets at most once — no dedup step.
    * Output: (q_id, rnk, n_id, dist_adc), smallest distance first. */
  def ivfPqProbe(spark: SparkSession, tableName: String, queries: DataFrame,
      idCol: String, vecCol: String, codebooks: Array[Array[Seq[Double]]],
      coarseCents: Array[Seq[Double]], k: Int, nprobe: Int = 3): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
      adcL2Tables(vecCol, codebooks).as("_tab"),
      explode(coarseProbeCells(col(vecCol), coarseCents, nprobe)).as("cell"))
    val scored = liveIvfPqIndex(spark, tableName)
      .join(q.hint("shuffle_merge"), "cell")
      .withColumn("dist_adc", adcL2Dist(codebooks.length, "pq_code"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("dist_adc").asc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "dist_adc")
  }

  /** Append a new corpus batch to an [[ivfPqIndexBuild]] table — encode
    * with the SAME codebooks/centroids, write delta-sized (the
    * crawl-ingestion lifecycle, like [[lshIndexAppend]] /
    * [[graft.ops.Dedup.dedupIndexAppend]]). Codebooks are frozen at
    * build time — the FAISS operating model; retrain + rebuild when the
    * vector distribution drifts. Rows are stamped with the index's
    * current generation, so re-appending a deleted id revives it. */
  def ivfPqIndexAppend(newCorpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Seq[Double]]], coarseCents: Array[Seq[Double]],
      tableName: String, tableBuckets: Int = 32): Unit =
    Bucketing.appendBucketed(
      Bucketing.withGen(
        ivfPqCoded(newCorpus, idCol, vecCol, codebooks, coarseCents),
        Bucketing.currentGen(newCorpus.sparkSession, tableName)),
      tableName, "cell", tableBuckets)

  /** Exact re-rank of ANN candidates — the FAISS "refine" stage, and the
    * reason ADC recall@k is measured on CANDIDATE SETS, not final
    * orderings: on concentrated high-dimensional data the gaps between
    * consecutive true neighbors sit below PQ quantization noise at any
    * practical code budget, so the serving pipeline takes a generous
    * ADC top-k' (k' ≈ 10k), joins back the k' RAW vectors per query,
    * and exact-L2 re-ranks to the final k. Candidate and query sides
    * are query-batch-bounded and broadcast; the corpus is touched by
    * one narrow semi-join-shaped pass — no corpus shuffle.
    * Output: (q_id, rnk, n_id, dist), exact squared L2, ascending. */
  def refineTopK(candidates: DataFrame, queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.l2sqN
    // distinct: duplicate (q_id, n_id) pairs from the caller (e.g. a
    // multi-probe that surfaces the same neighbor twice) would otherwise
    // occupy several of the final k ranks; candidate sets are
    // query-batch-bounded so the dedup is broadcast-cheap
    val cand = candidates.select(col("q_id"), col("n_id")).distinct()
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("_nv"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("_qv"))
    val w = Window.partitionBy("q_id").orderBy(col("dist").asc, col("n_id"))
    c.join(broadcast(cand), Seq("n_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("dist", l2sqN(col("_qv"), col("_nv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "dist")
  }

  /** Streaming IVFADC probe — [[ivfPqProbe]]'s stream-static sibling
    * (the serving path: a query stream against the persisted
    * [[ivfPqIndexBuild]] inverted file). Each incoming vector computes
    * its m×k ADC table once, explodes to its nprobe coarse cells, and
    * stream-static equi-joins the cell-bucketed code table — the same
    * zero-corpus-Exchange shape as the batch probe, re-resolved per
    * micro-batch so an index append between batches is picked up
    * without restart. Emission is threshold-match (dist_adc ≤ maxDist):
    * per-group ranking windows don't exist in append-mode streaming,
    * and because a corpus row lives in exactly ONE cell and probe cells
    * are distinct, a (query, candidate) pair meets at most once — the
    * operator is fully STATELESS (no watermark, no dedup state), unlike
    * [[graft.streaming.StreamingOps.annMatchStream]]'s multi-table LSH
    * collisions. Output: (q_id, ts, n_id, dist_adc), append mode. */
  def ivfPqMatchStream(stream: DataFrame, idCol: String, vecCol: String,
      tsCol: String, spark: SparkSession, tableName: String,
      codebooks: Array[Array[Seq[Double]]], coarseCents: Array[Seq[Double]],
      maxDist: Double, nprobe: Int = 3): DataFrame = {
    RefreshEnvelope.autoGuard(spark, tableName) // default-on envelope guard (r18)
    val q = stream.select(col(idCol).as("q_id"), col(tsCol).as("ts"),
      adcL2Tables(vecCol, codebooks).as("_tab"),
      explode(coarseProbeCells(col(vecCol), coarseCents, nprobe)).as("cell"))
    q.join(liveIvfPqIndex(spark, tableName), "cell")
      .withColumn("dist_adc", adcL2Dist(codebooks.length, "pq_code"))
      .filter(col("dist_adc") <= maxDist)
      .select("q_id", "ts", "n_id", "dist_adc")
  }

  /** Per-label element-wise mean embedding (the cluster-centroid /
    * class-prototype primitive): posexplode to (label, pos, v), average
    * per coordinate, reassemble in position order. The shuffle is keyed
    * on (label, pos) — |labels|·dim keys with map-side partial averages,
    * so the reduce side is tiny at any corpus size.
    * Output: (`labelCol`, centroid: array<double>, n). */
  def centroids(df: DataFrame, vecCol: String, labelCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("_pos", "_v")))
      .groupBy(labelCol, "_pos")
      .agg(avg("_v").as("_m"), count(lit(1)).as("_n"))
      .groupBy(labelCol)
      .agg(
        transform(array_sort(collect_list(struct(col("_pos"), col("_m")))),
          p => p("_m")).as("centroid"),
        max("_n").as("n"))

  /** Lloyd's k-means over an embedding column — the semantic-clustering
    * primitive behind diversity sampling and semantic dedup of a training
    * corpus. MLlib's dataflow without the MLlib dependency:
    *
    *   - init: the vectors of the k rows with the smallest `md5(id)` —
    *     hash-shuffled but fully deterministic on any engine/topology;
    *   - assign: each row scores k dot products against a BROADCAST
    *     literal centroid array (squared-L2 on pre-normalized vectors ≡
    *     cosine ordering) — a narrow per-row pass, the corpus is never
    *     joined or shuffled; ties break toward the lower cluster index;
    *   - update: [[centroids]]' (cluster,pos)-keyed partial-average
    *     shuffle — reduce side is k·dim keys at any corpus size; the
    *     driver only ever holds k·dim doubles per iteration. Clusters
    *     that go empty keep their previous centroid.
    *
    * Output: input columns + `cluster` (0-based).
    *
    * `cosine = false` switches to raw squared-L2 Lloyd's (no
    * normalization): argmin_c |x−c|² ≡ argmax_c (x·c − |c|²/2), with the
    * per-centroid |c|²/2 folded into a literal alongside the centroid
    * matrix — the assignment stays the same narrow broadcast-literal
    * pass. This is the codebook-training mode product quantization
    * needs. */
  /** Per-centroid score bias: 0 for cosine mode (pre-normalized dot),
    * |c|²/2 for raw-L2 mode (argmin |x−c|² ≡ argmax x·c − |c|²/2). */
  private[graft] def centroidBias(cents: Array[Seq[Double]],
      cosine: Boolean): Array[Double] =
    if (cosine) Array.fill(cents.length)(0.0)
    else cents.map(c => c.map(x => x * x).sum / 2)

  /** The pre-kernel HOF formulation of the k-means assignment (argmax
    * over an array_max of (score, −j) structs against a 2-D centroid
    * literal). Kept as the independent twin the spec pins
    * [[graft.functions.CentroidArgmax]] bit-equal against. */
  private[graft] def centroidArgmaxHof(v: Column,
      cents: Array[Seq[Double]], cosine: Boolean): Column = {
    val centsLit = typedLit(cents.map(_.toIndexedSeq).toIndexedSeq)
    val halfSq = typedLit(centroidBias(cents, cosine).toIndexedSeq)
    val scored = zip_with(centsLit, sequence(lit(0), lit(cents.length - 1)),
      (c, j) => struct(
        (aggregate(zip_with(v, c, (x, y) => x * y),
          lit(0.0), (a, x) => a + x) -
          (if (cosine) lit(0.0) else element_at(halfSq, j + 1))).as("s"),
        (lit(0) - j).as("nj")))
    -array_max(scored).getField("nj")
  }

  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5, cosine: Boolean = true): DataFrame =
    kmeansImpl(df, idCol, vecCol, k, iters, cosine)._1

  /** [[kmeans]]' training loop, returning the FINAL centroid matrix
    * instead of the assignment — the coarse-quantizer handle
    * [[ivfPqIndexBuild]] persists alongside the index (k·dim doubles,
    * driver-held and broadcast as literals like the PQ codebooks). */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5, cosine: Boolean = true): Array[Seq[Double]] =
    kmeansImpl(df, idCol, vecCol, k, iters, cosine)._2

  private def kmeansImpl(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, cosine: Boolean): (DataFrame, Array[Seq[Double]]) = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    // cosine: pre-normalize once so dot == cosine (zero vectors stay 0)
    val vd = transform(col(vecCol), _.cast("double"))
    val norm = sqrt(aggregate(vd, lit(0.0), (a, x) => a + x * x))
    val normed = df.withColumn("_nv",
      if (cosine) when(norm === 0.0, vd).otherwise(zip_with(vd,
        array_repeat(norm, size(col(vecCol))), (x, n) => x / n))
      else vd)
    normed.persist()
    try {
      var cents: Array[Seq[Double]] = normed
        .select(col("_nv"), md5(col(idCol).cast("string")).as("_h"))
        .orderBy("_h").limit(k)
        .collect().map(_.getSeq[Double](0))
      // The assignment is the native CentroidArgmax kernel: the k·dim
      // matrix + bias ride as array literals that the function builder
      // unpacks into codegen reference objects, so the per-row cost is
      // one tight multiply-add loop nest and the plan is constant-size
      // in k (no O(k·dim) expression fan-out). Bit-equal to the HOF
      // array_max formulation ([[centroidArgmaxHof]], pinned in
      // DedupSimilaritySpec) — the unrolled-SQL oracles are unchanged.
      def assigned: DataFrame =
        normed.withColumn("cluster", call_function("graft_centroid_argmax",
          col("_nv"), typedLit(cents.flatten.toIndexedSeq),
          typedLit(centroidBias(cents, cosine).toIndexedSeq)))
      // Mean update as ONE groupBy(cluster) with dim per-position avg
      // aggregates (r18 optimization): the previous [[centroids]] call
      // posexploded every vector to dim rows and paid a second
      // (cluster, pos)-keyed shuffle per iteration. dim is known here
      // (the init rows carry it), so the update is one map-side-combined
      // aggregation of k·dim cells — numerically identical (partial avg
      // sums accumulate in the same per-partition row order).
      val dim0 = cents.headOption.map(_.length).getOrElse(0)
      // cluster can be null (null/mis-sized embedding rows → the kernel
      // nulls the assignment); the pre-r18 posexplode path silently
      // dropped those rows from the mean. Skip the null GROUP on the
      // collected (≤ k+1)-row result instead of filtering before the
      // groupBy: a Filter(isNotNull(cluster)) gets pushed below the
      // projection and DUPLICATES the argmax kernel per row (guide §4.4
      // — measured +0.9 s on the IVFADC build). An empty input (no init
      // rows, dim0 = 0) skips the update loop entirely instead of
      // failing analysis on agg(array()) (r18 ADVICE).
      def meansOf(df: DataFrame): Map[Int, Seq[Double]] =
        df.groupBy("cluster")
          .agg(array((0 until dim0).map(i => avg(col("_nv")(i))): _*)
            .as("centroid"))
          .collect()
          .iterator.filter(!_.isNullAt(0))
          .map(r => r.getInt(0) ->
            (r.getSeq[Double](1).toIndexedSeq: Seq[Double]))
          .toMap
      if (dim0 > 0) for (_ <- 1 to iters) {
        val next = meansOf(assigned)
        cents = cents.zipWithIndex.map { case (old, j) => next.getOrElse(j, old) }
      }
      (assigned.drop("_nv"), cents)
    } finally normed.unpersist()
  }

  /** Symmetric per-vector int8 quantization — the embedding storage path
    * at corpus scale (4× smaller than float32, dot products stay
    * rank-faithful). `scale = max|v| / 127`, `q_i = floor(v_i/scale + .5)`
    * ∈ [-127, 127] (explicit half-up — engine-independent, unlike
    * round()); zero vectors quantize to zeros with scale 0. Purely narrow.
    * Adds `q_scale: double` and `q_vec: array<tinyint>`. */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val vd = transform(col(vecCol), _.cast("double"))
    val s = aggregate(vd, lit(0.0), (a, x) => greatest(a, abs(x))) / lit(127.0)
    df.withColumn("q_scale", s)
      .withColumn("q_vec", transform(col(vecCol), x =>
        when(col("q_scale") === 0.0, lit(0))
          .otherwise(floor(x.cast("double") / col("q_scale") + 0.5))
          .cast("tinyint")))
  }

  /** Reconstruct float vectors from [[quantizeInt8]] output (`q_i·scale`).
    * Adds `deq_vec: array<double>`. */
  def dequantizeInt8(df: DataFrame, qCol: String = "q_vec",
      scaleCol: String = "q_scale"): DataFrame =
    df.withColumn("deq_vec",
      transform(col(qCol), x => x.cast("double") * col(scaleCol)))

  /** Product-quantization codebooks: `m` contiguous subspaces, each with
    * a `k`-codeword codebook trained by raw-L2 [[kmeans]] on the
    * subvectors. Returns `m` codebooks of up to `k` codewords (empty
    * clusters are dropped — the codebook is a codeword LIST; PQ codes
    * index it, kmeans cluster ids are irrelevant). Codebooks are
    * m·k·(dim/m) doubles — driver-held and broadcast as literals, tiny
    * at any corpus size. */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String, m: Int,
      k: Int, iters: Int = 3): Array[Array[Seq[Double]]] = {
    // Init rows + dim in ONE collect job (r19, verdict item 6 — was a
    // separate size() probe job plus a post-slice init collect): the k
    // md5-least rows arrive with their full double-cast vectors, dim is
    // their length, and the per-subspace init codewords are sliced
    // driver-side — the identical elements the old sliced-side collect
    // produced (Spark's elementwise cast ≡ the driver-side IEEE
    // widening, and slice bounds clamp the same way).
    val initRaw: Array[IndexedSeq[Double]] = df
      .select(transform(col(vecCol), _.cast("double")).as("_v"),
        md5(col(idCol).cast("string")).as("_h"))
      .orderBy("_h").limit(k)
      .collect()
      .map(_.getSeq[Double](0).toIndexedSeq)
    val dim = initRaw.head.length
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    // All m subspace Lloyd's loops share their corpus passes: one
    // persisted slice pass, then ONE job per iteration that assigns and
    // re-means every subspace at once (explode m (subspace, cluster,
    // subvector) entries per row, mean keyed by (subspace, cluster)).
    // The per-subspace sequential form costs m·(iters+2) full corpus
    // jobs; this costs iters+2 — the math is identical: the md5-least
    // init rows are the same rows for every subspace, the assignment is
    // the same CentroidArgmax kernel per subspace, and the mean update
    // differs only in float summation order (the ~1e-16 fuzz the
    // kmeans oracles already document).
    val sliced = df.select(col(idCol).as("_pid"),
      array((0 until m).map(j =>
        transform(slice(col(vecCol), j * sub + 1, sub),
          _.cast("double"))): _*).as("_subs"))
    sliced.persist()
    try {
      val initRows: Array[IndexedSeq[IndexedSeq[Double]]] =
        initRaw.map(v => (0 until m)
          .map(j => v.slice(j * sub, j * sub + sub)).toIndexedSeq)
      var cents: Array[Array[Seq[Double]]] =
        (0 until m).toArray.map(j => initRows.map(r => r(j): Seq[Double]))
      def meansOfAssignment(): Map[(Int, Int), Seq[Double]] = {
        val assigns = array((0 until m).map(j => struct(
          lit(j).as("j"),
          call_function("graft_centroid_argmax", col("_subs")(j),
            typedLit(cents(j).flatten.toIndexedSeq),
            typedLit(centroidBias(cents(j), cosine = false).toIndexedSeq))
            .as("cluster"),
          col("_subs")(j).as("v"))): _*)
        // one groupBy (j, cluster) with `sub` per-position avg aggregates
        // (r18 optimization — was posexplode to sub× the rows plus a
        // second (j, cluster, pos)-keyed shuffle and a collect_list
        // re-sort; numerically identical, see [[kmeans]]' mean update)
        sliced.select(explode(assigns).as("a"))
          .select(col("a.j").as("j"), col("a.cluster").as("cluster"),
            col("a.v").as("v"))
          .groupBy("j", "cluster")
          .agg(array((0 until sub).map(i => avg(col("v")(i))): _*)
            .as("centroid"))
          .collect()
          // null-cluster group (mis-sized/null subvectors) skipped on the
          // collected rows — same tolerate-nulls contract as kmeans'
          // meansOf, and no per-row filter to duplicate the kernel
          .iterator.filter(!_.isNullAt(1))
          .map(r => (r.getInt(0), r.getInt(1)) ->
            (r.getSeq[Double](2).toIndexedSeq: Seq[Double]))
          .toMap
      }
      for (_ <- 1 to iters) {
        val next = meansOfAssignment()
        cents = cents.zipWithIndex.map { case (cbj, j) =>
          cbj.zipWithIndex.map { case (old, c) => next.getOrElse((j, c), old) }
        }
      }
      // the codebook is the mean of the FINAL assignment, present
      // clusters only, ordered by cluster id (empties dropped — PQ
      // codes index the codeword LIST, cluster ids are irrelevant)
      val fin = meansOfAssignment()
      (0 until m).toArray.map { j =>
        (0 until k).flatMap(c => fin.get((j, c))).toArray
      }
    } finally sliced.unpersist()
  }

  /** Encode vectors against [[pqTrain]] codebooks: per subspace, the
    * argmin-L2 codeword index (ties to the lower index). Adds
    * `pq_code: array<int>` of length m — at k ≤ 256 that is m bytes of
    * information per vector vs 4·dim float bytes (16 vs 256 bytes at
    * dim=64/m=16). A pure broadcast-literal projection: no join, no
    * shuffle, same shape as the kmeans assignment pass. */
  def pqEncode(df: DataFrame, vecCol: String,
      codebooks: Array[Array[Seq[Double]]]): DataFrame = {
    val m = codebooks.length
    val dim = codebooks.map(_.head.length).sum
    val sub = dim / m
    // per-subspace argmin-L2 codeword via the [[graft.functions.
    // CentroidArgmax]] codegen kernel (r18 optimization): identical
    // semantics to the HOF array_max formulation it replaces — argmax of
    // (dot − |c|²/2) with ties to the lower index, the bit-equality
    // DedupSimilaritySpec pins for the kmeans assignment — but a
    // constant-size plan node per subspace instead of an O(k) expression
    // tree (the m=16, k=32 encode expression dominated plan/codegen time
    // in the IVFADC build).
    def code(j: Int): Column = {
      val cb = codebooks(j)
      val subV = transform(slice(col(vecCol), j * sub + 1, sub), _.cast("double"))
      call_function("graft_centroid_argmax", subV,
        typedLit(cb.flatten.toIndexedSeq),
        typedLit(centroidBias(cb, cosine = false).toIndexedSeq))
    }
    df.withColumn("pq_code", array((0 until m).map(code): _*))
  }

  /** Reconstruct vectors from PQ codes (concatenated codewords). Adds
    * `pq_vec: array<double>`. Narrow, codebooks as literals. */
  def pqDecode(df: DataFrame, codebooks: Array[Array[Seq[Double]]],
      codeCol: String = "pq_code"): DataFrame = {
    val parts = codebooks.zipWithIndex.map { case (cb, j) =>
      element_at(typedLit(cb.map(_.toIndexedSeq).toIndexedSeq),
        element_at(col(codeCol), j + 1) + 1)
    }
    df.withColumn("pq_vec", flatten(array(parts.toIndexedSeq: _*)))
  }

  /** ADC (asymmetric distance computation) top-k search over PQ codes:
    * each query precomputes its m×k table of partial dot products
    * against the codebooks (k·dim work, done once per query, inside the
    * broadcast row); scoring a corpus vector is then m array lookups on
    * its byte codes — the corpus pass reads m ints per row instead of
    * dim floats, which is the entire point of PQ at 100 TB. The query
    * side (queries + tables) broadcasts, so the SCAN is shuffle-free;
    * the top-k window then exchanges scored rows by q_id — bounded by
    * |corpus|·|queries| before reduction, but Spark's WindowGroupLimit
    * rewrite applies the rank filter map-side first, so what actually
    * crosses the wire is ≤ k·partitions rows per query. With a
    * non-trivial query set that per-query term, not zero, is the real
    * shuffle bound. Output: (q_id, rnk, n_id, sim_adc). */
  def pqTopK(queries: DataFrame, corpusCodes: DataFrame,
      codebooks: Array[Array[Seq[Double]]], idCol: String, vecCol: String,
      codeIdCol: String, codeCol: String, k: Int): DataFrame = {
    val m = codebooks.length
    val tab = adcTablesCol(col(vecCol), codebooks, squared = false)
    val q = queries.select(col(idCol).as("q_id"), tab.as("_tab"))
    val scored = corpusCodes
      .select(col(codeIdCol).as("n_id"), col(codeCol).as("_code"))
      .crossJoin(broadcast(q))
      .withColumn("sim_adc", (0 until m).map(j =>
          element_at(element_at(col("_tab"), j + 1),
            element_at(col("_code"), j + 1) + 1))
        .reduce(_ + _))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim_adc").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "sim_adc")
  }

  /** Diversity-balanced subset: semantic-cluster the corpus with
    * [[kmeans]], then keep at most `perCluster` rows per cluster —
    * deterministic md5-rank selection (same engine-portable coin as
    * [[Curation.sampleStratified]]), so the sample is reproducible on
    * any topology. The quota filter is a rank-≤-N window, which Spark
    * executes as a heap-based WindowGroupLimit — each cluster's
    * candidates are pruned map-side, never fully sorted, so the pass
    * stays bounded on a 100 TB corpus with billion-row clusters.
    * Output: input columns + `cluster`. */
  def diversitySample(df: DataFrame, idCol: String, vecCol: String,
      k: Int, perCluster: Int, iters: Int = 5): DataFrame = {
    require(perCluster > 0, "perCluster must be positive")
    val w = Window.partitionBy("cluster")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    kmeans(df, idCol, vecCol, k, iters)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= perCluster)
      .drop("_rk")
  }

  /** Per-dimension standardization (z-scoring) of an embedding column —
    * the feature-scaling pass before distance-based ops when dimensions
    * have heterogeneous scales. One (pos)-keyed aggregation computes
    * dim-bounded (μ, σ) — collected to the driver (|dim| doubles, like
    * the k-means centroid literals) and re-broadcast as literals — then
    * the transform is a narrow zip_with. Zero-variance dims pass
    * through unscaled (σ treated as 1). Adds `z_vec: array<double>`. */
  def standardizeDims(df: DataFrame, vecCol: String): DataFrame = {
    val stats = df
      .select(posexplode(transform(col(vecCol), _.cast("double")))
        .as(Seq("_p", "_v")))
      .groupBy("_p")
      .agg(avg("_v").as("_mu"), stddev_pop("_v").as("_sd"))
      .orderBy("_p").collect()
    val mus = typedLit(stats.map(_.getDouble(1)).toIndexedSeq)
    val sds = typedLit(stats.map(r =>
      if (r.getDouble(2) == 0.0) 1.0 else r.getDouble(2)).toIndexedSeq)
    df.withColumn("z_vec",
      zip_with(transform(col(vecCol), _.cast("double")),
        sequence(lit(0), lit(stats.length - 1)),
        (x, i) => (x - element_at(mus, i + 1)) / element_at(sds, i + 1)))
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    * embeddings with [[kmeans]], then inside each cluster drop every
    * row that has a SMALLER-id neighbor with cosine ≥ `threshold` (the
    * deterministic keep-lowest-id election — the paper keeps one
    * arbitrary representative per semantic duplicate group; min-id
    * makes that reproducible on any topology).
    *
    * Scale shape: the cluster id is exactly the blocking key
    * [[cosineNearDupPairs]] needs, so the pair join is bounded by
    * cluster size — k is the dial that keeps |cluster| ≈ n/k rows, and
    * at 100 TB the clusters come from a sampled-fit kmeans and the
    * pair stage shuffles each cluster once. No all-pairs anywhere.
    *
    * Returns the KEPT rows (all input columns + `cluster`).
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, threshold: Double): DataFrame = {
    val assigned = kmeans(df, idCol, vecCol, k, iters)
    val dropIds = cosineNearDupPairs(assigned, idCol, vecCol,
        "cluster", threshold)
      .select(col("id_b").as(idCol)).distinct()
    assigned.join(dropIds, Seq(idCol), "left_anti")
  }

  /** Johnson–Lindenstrauss random projection to `dOut` dimensions with
    * a deterministic ±1/√dOut sign matrix (Achlioptas 2003: ±1 entries
    * preserve pairwise distances in expectation exactly like Gaussians,
    * and cost only sign-flipped adds). The matrix rows reuse
    * [[graft.functions.HyperplaneSignature.signMatrix]]'s splitmix64
    * derivation, so any engine (or the DuckDB oracle) can regenerate
    * them from (seed, dOut) — no matrix is stored or shipped.
    *
    * Scale shape: dOut codegen'd [[graft.functions.VectorFunctions.dotN]]
    * folds per row — purely narrow, no shuffle, no driver state; the
    * projected corpus is dOut/dim the size of the input, which is the
    * point (cheaper downstream LSH/kmeans/dedup at equal recall).
    * Adds `proj: array<double>` of length dOut.
    */
  def randomProjection(df: DataFrame, vecCol: String, dim: Int,
      dOut: Int, seed: Long = 42L): DataFrame = {
    import graft.functions.HyperplaneSignature.{signMatrix, MaxDim}
    // each signMatrix row is MaxDim sign slots wide — dims past that
    // would silently read the NEXT row's bits (correlated projections)
    require(dim <= MaxDim,
      s"input dim $dim exceeds the $MaxDim-wide sign rows")
    val m = signMatrix(dOut, seed)
    val scale = 1.0 / math.sqrt(dOut.toDouble)
    val vd = transform(col(vecCol), _.cast("double"))
    val comps = (0 until dOut).map { k =>
      val signs = (0 until dim)
        .map(j => if (m(k * MaxDim + j)) 1.0 else -1.0)
      dotN(vd, typedLit(signs)) * scale
    }
    df.withColumn("proj", array(comps: _*))
  }

  /** Hard-negative mining for contrastive training: for each query row,
    * the top-k most-cosine-similar corpus rows with a DIFFERENT label —
    * the "close but wrong" examples a retrieval/embedding trainer pairs
    * against positives. Same scale shape as [[bruteForceTopK]]: the
    * query set broadcasts, the corpus streams through one narrow scoring
    * pass, and the per-query top-k is a WindowGroupLimit heap (map-side
    * pruned, never a full sort). At 100 TB the label filter rides the
    * scan (predicate on the streamed side, no shuffle).
    * Output: q_id, q_label, rnk, n_id, n_label, sim. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      col(labelCol).as("n_label"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    broadcast(q).crossJoin(c)
      .filter(col("q_label") =!= col("n_label"))
      .withColumn("sim", cosineN(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "q_label", "rnk", "n_id", "n_label", "sim")
  }

  /** kNN label vote: for each query, the majority label among its top-k
    * exact-cosine neighbors (ties broken by smaller label id). */
  def knnLabel(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val labeled = corpus.select(col(idCol).as("n_id"), col(labelCol).as("n_label"))
    val top = bruteForceTopK(queries, corpus, idCol, vecCol, k)
      .join(labeled, "n_id")
    val w = Window.partitionBy("q_id")
      .orderBy(col("votes").desc, col("n_label"))
    top.groupBy("q_id", "n_label").agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("n_label").as("pred_label"), col("votes"))
  }
}
