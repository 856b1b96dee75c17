package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated joins for the regime where BOTH sides are too large to
  * broadcast and the join key is hot-spotted (the classic 100 TB failure:
  * one user_id / null-ish key holds 20% of the fact table, so one reducer
  * gets 20 TB while 999 executors idle). AQE's skew-join split handles
  * post-shuffle partition skew; salting handles it at the partitioning
  * level — including for aggregations AQE can't split.
  *
  * Mechanics: the big (skewed) side gets a deterministic salt in
  * [0, salts) hashed from the full row, widening each hot key onto
  * `salts` reducers; the other side is replicated `salts`× with
  * `explode(sequence(...))` and the join runs on (key, salt). The result
  * multiset is EXACTLY the plain equi-join's — salt only routes rows —
  * which is what the DuckDB oracle checks (q_join_salted).
  *
  * [[graft.core.Transforms.saltedJoin]] is the USING-join convenience
  * variant (same key name, merged key column, inner only); this is the
  * general form.
  */
object SkewJoins {

  private val SaltCol = "_graft_salt"

  /** Equi-join `big ⋈ other` on `bigKey = otherKey`, with the big side's
    * rows salted across `salts` partitions per key. `joinType` may be
    * "inner" or "left" (left-outer of the BIG side: an unmatched big row
    * carries one salt value, so it surfaces exactly once). The
    * replication cost is `salts × |other|` shuffled rows — choose
    * `salts` ≈ the skew factor, not the cluster width. */
  def saltedEquiJoin(big: DataFrame, other: DataFrame, bigKey: String,
      otherKey: String, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 1, s"salts must exceed 1, got $salts")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting supports inner/left of the big side, got $joinType")
    val salted = big.withColumn(SaltCol,
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val replicated = other.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated,
        salted(bigKey) === replicated(otherKey) &&
          salted(SaltCol) === replicated(SaltCol),
        joinType)
      .drop(SaltCol)
  }
}
