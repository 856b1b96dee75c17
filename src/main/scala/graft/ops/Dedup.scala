package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation
  * (SURVEY.md §2.3 north-star "Near-dup / similarity" row).
  *
  * Scale design (the point at 100 TB):
  *   - Exact dedup is a hash-partitioned groupBy on the fingerprint — one
  *     shuffle, map-side combine, no driver state.
  *   - MinHash/LSH near-dup never compares all pairs: signatures are
  *     computed per-row (narrow), banded, and only rows sharing a
  *     (band, band-hash) bucket are self-joined. Bucket sizes are bounded
  *     by `maxBucket` (oversized buckets = degenerate content, dropped
  *     with a count, never exploded into O(n²) work).
  *   - SimHash near-dup buckets by the high bits of the 64-bit signature,
  *     so candidate generation is also a bounded equi-join.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text fingerprint.
    * Returns (fingerprint, n_dups, min_doc_id = canonical representative).
    */
  def exactDupGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_dups"), min(idCol).as("canonical_id"))

  /** Keep one row per normalized-text fingerprint (the min-id row wins —
    * deterministic, unlike dropDuplicates). */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactDupGroups(docs, textCol, idCol)
      .select(col("canonical_id").as(idCol))
    docs.join(keep, idCol) // canonical ids are unique → inner join keeps one per group
  }

  /** MinHash signature column: for permutation i (0 until numHashes),
    * sig[i] = min over shingles of ((a_i * xxhash64(sh) + b_i) mod p).
    * Coefficients derive from the seeded Spark hash, so the signature is a
    * pure per-row expression — no fitted model or broadcast state.
    */
  private def minhashSig(shinglesCol: org.apache.spark.sql.Column, numHashes: Int) = {
    // 2^31-1 (Mersenne prime): keeps a*h+b < 2^62, inside long range even
    // under ANSI overflow checking.
    val p = lit(2147483647L)
    val hs = transform(shinglesCol, sh => pmod(xxhash64(sh), p))
    transform(sequence(lit(0), lit(numHashes - 1)), i => {
      val a = pmod(xxhash64(lit("minhash-a"), i), p - 1) + 1
      val b = pmod(xxhash64(lit("minhash-b"), i), p)
      array_min(transform(hs, h => pmod(a * h + b, p)))
    })
  }

  /** Candidate near-duplicate pairs via MinHash + banded LSH.
    *
    * numHashes = bands * rowsPerBand. Two docs become a candidate pair iff
    * they agree on all rows of at least one band. Output:
    * (id_a, id_b, jaccard) with id_a < id_b, verified against the exact
    * shingle-set Jaccard and filtered to >= threshold.
    */
  def minhashNearDup(
      docs: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSig = docs
      .select(col(idCol).as("id"),
        array_distinct(shingles(tokens(col(textCol)), shingleLen)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSig(col("sh"), numHashes))
    // explode into (band, hash-of-band-slice) buckets
    val banded = withSig.select(
      col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
            .as("bh")))).as("bucket"))
      .select(col("id"), col("sh"), col("bucket.band"), col("bucket.bh"))
    // drop degenerate buckets instead of exploding them quadratically
    val wcount = banded
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .filter(col("bsz") <= maxBucket)
    val l = wcount.select(col("band"), col("bh"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = wcount.select(col("band"), col("bh"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup candidates: bucket by the top `prefixBits` of the
    * 64-bit signature, compare within buckets, keep pairs with Hamming
    * distance <= maxHamming. One equi-join, no all-pairs comparison. */
  def simhashNearDup(
      docs: DataFrame, textCol: String, idCol: String,
      prefixBits: Int = 12, maxHamming: Int = 8): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"),
        simhash(tokens(col(textCol))).as("sig"))
      .withColumn("bucket", shiftrightunsigned(col("sig"), 64 - prefixBits))
    val l = sigs.select(col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = sigs.select(col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact all-pairs n-gram Jaccard within a blocking key (reference
    * implementation for recall measurement; the blocking column keeps the
    * self-join from being a full cross product). */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String, blockCol: String,
      shingleLen: Int = 3, threshold: Double = 0.2): DataFrame = {
    val t = docs.select(col(blockCol).as("blk"), col(idCol).as("id"),
      array_distinct(shingles(tokens(col(textCol)), shingleLen)).as("sh"))
    val l = t.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = t.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, "blk")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
