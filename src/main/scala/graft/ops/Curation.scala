package graft.ops

import graft.core.Transforms
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
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
  def decontaminate(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, shingleLen: Int = 3,
      minOverlap: Int = 1): DataFrame = {
    val contaminated = contaminationCounts(
        docs, textCol, idCol, bench, benchTextCol, shingleLen)
      .filter(col("n_contam") >= minOverlap)
      .select(col("id").as(idCol))
    docs.join(contaminated, Seq(idCol), "left_anti")
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
}
