package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: edit-distance joins between a
  * dirty record stream and a clean reference catalog — the classic
  * dedup-across-sources shape (link crawled author/product/user strings
  * back to canonical entities before training on them).
  *
  * The candidate generator is the PassJoin idea (Li, Deng, Feng —
  * "PASS-JOIN: a partition-based method for similarity joins", PVLDB
  * 2011): partition the clean string into τ+1 contiguous segments; a
  * single point edit (τ = 1) leaves at least one segment untouched, and
  * an untouched HEAD segment matches as an exact prefix while an
  * untouched TAIL segment stays right-aligned whatever length shift the
  * edit caused. Candidates are therefore the union of two EQUI-joins —
  * head-key equality ∪ tail-key equality — with exact recall (no
  * candidate within distance 1 can be missed), verified by one codegen
  * `levenshtein` per surviving pair.
  */
object Linkage {

  /** τ = 1 edit-distance join (typo tolerance): every (dirty, clean)
    * pair within Levenshtein distance ≤ 1, via exact-recall prefix/suffix
    * blocking + levenshtein verify.
    *
    * `headLen`/`tailLen` pick the split point. Choose it to balance
    * SELECTIVITY, not length: entropy in id-like strings concentrates in
    * the tail (zero-padded keys, common name prefixes), so the split is
    * deliberately extreme — e.g. head 16 / tail 2 on an 18-char key
    * turns a 32M-pair naive cross join into ~0.3M verified candidates at
    * sf0.1 (measured in LinkageSpec / q_fuzzy_link). Zipf-hot blocking
    * keys are a skew-join problem; AQE's skew split handles the hot
    * bucket, same as any other skewed equi-join in the engine.
    *
    * Output: (d_id, d_s, c_id, c_s, dist), dist ≤ 1. Scale shape: two
    * shuffles keyed by short block keys + a pair-distinct — never a
    * cross join; the verify is codegen'd and runs only on candidates.
    * For τ > 1 see [[editJoin]] (full τ+1-segment PassJoin).
    *
    * Exact recall holds for pairs where BOTH strings have
    * `length ≥ headLen + tailLen`: on shorter strings the head and tail
    * key regions overlap, and one edit landing in the overlap changes
    * both keys (r11 ADVICE). Pairs involving a shorter string are
    * therefore routed through a broadcast naive leg — the blocked legs
    * keep their plan, and recall is unconditional.
    *
    * DEGENERATE REGIME (r12 verdict): that naive leg
    * broadcast-nested-loop-joins ALL strings below the split, so the
    * blocked legs only earn their keep when MOST strings clear
    * `headLen + tailLen`. A caller who picks head 16 / tail 2 on a
    * corpus of ~12-char names gets the full cross product back —
    * correct (LinkageSpec pins exactness on a mostly-short corpus) but
    * with none of PassJoin's pruning. Pick a split most strings clear,
    * or use [[editJoin]](τ = 1), whose naive leg is bounded at
    * `length < τ + 1` (i.e. < 2 chars) regardless of parameters.
    */
  def editJoin1(dirty: DataFrame, dId: String, dStr: String,
      clean: DataFrame, cId: String, cStr: String,
      headLen: Int, tailLen: Int): DataFrame = {
    val d = dirty.select(col(dId).as("d_id"), col(dStr).as("d_s"))
    val c = clean.select(col(cId).as("c_id"), col(cStr).as("c_s"))
    val minLen = headLen + tailLen
    val dLong = d.filter(length(col("d_s")) >= minLen)
    val cLong = c.filter(length(col("c_s")) >= minLen)
    val byHead = dLong.withColumn("k", substring(col("d_s"), 1, headLen))
      .join(cLong.withColumn("k", substring(col("c_s"), 1, headLen)), Seq("k"))
    val byTail = dLong.withColumn("k", substring(col("d_s"), -tailLen, tailLen))
      .join(cLong.withColumn("k", substring(col("c_s"), -tailLen, tailLen)), Seq("k"))
    // any pair whose min length < headLen+tailLen has both lengths
    // ≤ headLen+tailLen (|len diff| ≤ 1), so this leg covers exactly the
    // pairs the blocked legs cannot guarantee; overlap with them is
    // harmless — the pair-distinct follows
    val short = d.filter(length(col("d_s")) <= minLen)
      .join(broadcast(c.filter(length(col("c_s")) <= minLen)),
        abs(length(col("d_s")) - length(col("c_s"))) <= 1)
    byHead.select("d_id", "d_s", "c_id", "c_s")
      .unionByName(byTail.select("d_id", "d_s", "c_id", "c_s"))
      .unionByName(short.select("d_id", "d_s", "c_id", "c_s"))
      .distinct()
      .withColumn("dist", levenshtein(col("d_s"), col("c_s")))
      .filter(col("dist") <= 1)
  }

  /** General τ ≥ 1 edit-distance join: every (dirty, clean) pair within
    * Levenshtein distance ≤ τ, by the full τ+1-segment PassJoin (Li,
    * Deng, Feng, PVLDB 2011) — the record-linkage workhorse (real names
    * need τ = 2).
    *
    * Blocking, with EXACT recall by the pigeonhole argument: the clean
    * string s (length L) is split into τ+1 contiguous even segments
    * (lengths ⌊L/(τ+1)⌋, the remainder distributed to the LAST
    * segments); ≤ τ edits cannot touch all τ+1 segments, so some segment
    * survives verbatim in the dirty string r, and its start position can
    * shift from p_i by at most τ (each edit shifts alignment by ≤ 1).
    * The dirty side therefore emits, for every plausible clean length
    * L ∈ [len(r)−τ, len(r)+τ] and segment index i, the substrings of r
    * with the segment's length at positions within p_i ± τ — at most
    * (2τ+1)²·(τ+1) short keys per row (75 at τ = 2) — and candidates are
    * ONE equi-join on the (i, L, segment) key. Clean strings shorter
    * than τ+1 cannot be segmented and go through a broadcast naive leg.
    *
    * Output: (d_id, d_s, c_id, c_s, dist), dist ≤ τ. Scale shape: one
    * shuffle keyed by short segment keys + a pair-distinct — never a
    * cross join of the corpus sides; the levenshtein verify is codegen'd
    * and runs only on candidates. LinkageSpec pins recall == the naive
    * join at two SFs.
    */
  def editJoin(dirty: DataFrame, dId: String, dStr: String,
      clean: DataFrame, cId: String, cStr: String, tau: Int): DataFrame = {
    require(tau >= 1, s"tau must be >= 1, got $tau")
    val nseg = tau + 1
    val d = dirty.select(col(dId).as("d_id"), col(dStr).as("d_s"))
    val c = clean.select(col(cId).as("c_id"), col(cStr).as("c_s"))
    // even-partition arithmetic, shared by both sides: for clean length
    // L, segment i has length base+1 for the last (L mod nseg) segments
    // and start p_i = 1 + i·base + max(0, i − (nseg − L mod nseg))
    def segLen(len: Column, i: Int): Column = {
      val rem = pmod(len, lit(nseg))
      val base = ((len - rem) / nseg).cast("int")
      base + when(lit(i) >= lit(nseg) - rem, 1).otherwise(0)
    }
    def segStart(len: Column, i: Int): Column = {
      val rem = pmod(len, lit(nseg))
      val base = ((len - rem) / nseg).cast("int")
      lit(1) + lit(i) * base + greatest(lit(0), lit(i) - (lit(nseg) - rem))
    }
    val emptyKeys = array().cast("array<struct<i:int,l:int,seg:string>>")
    // clean side: τ+1 segment keys per string
    val cKeys = (0 until nseg).map { i =>
      val len = length(col("c_s"))
      struct(lit(i).as("i"), len.as("l"),
        col("c_s").substr(segStart(len, i), segLen(len, i)).as("seg"))
    }
    val cSeg = c.filter(length(col("c_s")) >= nseg)
      .select(col("c_id"), col("c_s"), explode(array(cKeys: _*)).as("k"))
    // dirty side: candidate substrings for every plausible clean length
    // and segment, within the ±τ position window
    val dKeyArrays = for (delta <- -tau to tau; i <- 0 until nseg) yield {
      val lenR = length(col("d_s"))
      val lenS = lenR + delta
      val li = segLen(lenS, i)
      val pi = segStart(lenS, i)
      // ±τ window, tightened at the last segment: it has nothing after
      // it in s, so its match must END within τ of the end of r. (The
      // first segment needs no extra clause — p_0 = 1 makes the generic
      // bounds already [1, 1+τ]: nothing before it can be deleted, and
      // only insertions can push it right.)
      val jlo0 = greatest(lit(1), pi - tau)
      val jlo = if (i == nseg - 1) greatest(jlo0, lenR - tau - li + 1) else jlo0
      val jhi = least(lenR - li + 1, pi + tau)
      when(lenS >= nseg && jlo <= jhi,
        transform(sequence(jlo, jhi), j =>
          struct(lit(i).as("i"), lenS.as("l"),
            col("d_s").substr(j, li).as("seg"))))
        .otherwise(emptyKeys)
    }
    val dSeg = d
      .select(col("d_id"),
        explode(array_distinct(flatten(array(dKeyArrays: _*)))).as("k"))
    // candidate generation carries IDS ONLY through the join + distinct
    // (a hot shared-prefix segment can emit |dirty|·|bucket| pairs; 16-
    // byte id pairs shuffle, the strings rejoin afterwards — same trick
    // as minhashNearDup's verify stage). Requires unique ids per side.
    val candIds = dSeg.join(cSeg.select(col("c_id"), col("k")), Seq("k"))
      .select("d_id", "c_id")
    // clean strings too short to partition: broadcast naive leg (their
    // partners are all within length τ of ≤ τ chars — a tiny set)
    val short = d.join(
      broadcast(c.filter(length(col("c_s")) < nseg)),
      abs(length(col("d_s")) - length(col("c_s"))) <= tau)
      .select("d_id", "c_id")
    candIds.unionByName(short).distinct()
      .join(d, Seq("d_id")).join(c, Seq("c_id"))
      // threshold levenshtein: O(τ·len) banded DP per pair, -1 past τ
      .withColumn("dist", levenshtein(col("d_s"), col("c_s"), tau))
      .filter(col("dist") =!= -1)
      .select("d_id", "d_s", "c_id", "c_s", "dist")
  }
}
