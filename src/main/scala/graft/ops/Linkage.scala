package graft.ops

import org.apache.spark.sql.DataFrame
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
    * For τ > 1 partition into τ+1 segments with a position-window join
    * (same paper); not needed for the typo case this engine registers.
    */
  def editJoin1(dirty: DataFrame, dId: String, dStr: String,
      clean: DataFrame, cId: String, cStr: String,
      headLen: Int, tailLen: Int): DataFrame = {
    val d = dirty.select(col(dId).as("d_id"), col(dStr).as("d_s"))
    val c = clean.select(col(cId).as("c_id"), col(cStr).as("c_s"))
    val byHead = d.withColumn("k", substring(col("d_s"), 1, headLen))
      .join(c.withColumn("k", substring(col("c_s"), 1, headLen)), Seq("k"))
    val byTail = d.withColumn("k", substring(col("d_s"), -tailLen, tailLen))
      .join(c.withColumn("k", substring(col("c_s"), -tailLen, tailLen)), Seq("k"))
    byHead.unionByName(byTail)
      .select("d_id", "d_s", "c_id", "c_s").distinct()
      .withColumn("dist", levenshtein(col("d_s"), col("c_s")))
      .filter(col("dist") <= 1)
  }
}
