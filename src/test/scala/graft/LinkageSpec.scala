package graft

import graft.ops.Linkage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PassJoin τ=1 blocking semantics: exact recall against the naive
  * cross-join-and-verify formulation for every point-edit type at every
  * position class (head segment, tail segment, the split boundary), plus
  * the candidate-prune measurement the operator doc claims.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def naivePairs(dirty: DataFrame, clean: DataFrame): Set[(Long, Long)] =
    dirty.crossJoin(clean)
      .filter(levenshtein(col("d_s"), col("c_s")) <= 1)
      .select("d_id", "c_id").as[(Long, Long)].collect().toSet

  private def blockedPairs(dirty: DataFrame, clean: DataFrame,
      head: Int, tail: Int): Set[(Long, Long)] =
    Linkage.editJoin1(dirty, "d_id", "d_s", clean, "c_id", "c_s", head, tail)
      .select("d_id", "c_id").as[(Long, Long)].collect().toSet

  test("editJoin1: recall == naive for delete/substitute/insert at head, tail, and boundary") {
    val clean = Seq((1L, "Customer#000000123"), (2L, "Customer#000001499"),
      (3L, "Supplier#000000007")).toDF("c_id", "c_s")
    // one point edit each, spread across positions 1, 8, 15, 16, 17, 18
    val dirty = Seq(
      (10L, "ustomer#000000123"),  // delete at 1 (head segment)
      (11L, "CustomerX000001499"), // substitute at 9 (head)
      (12L, "Customer#00000012"),  // delete at 18 (tail segment)
      (13L, "Customer#0000014x9"), // substitute at 17 (tail)
      (14L, "Customer#0000001499"),// insert at 16 (boundary)
      (15L, "Customer#0000001233"),// insert at 18 (tail)
      (16L, "Supplier#000000070"), // insert at 18
      (17L, "totally different"),  // no match at all
      (18L, "Customer#000000123")) // exact (distance 0)
      .toDF("d_id", "d_s")
    val naive = naivePairs(dirty, clean)
    val blocked = blockedPairs(dirty, clean, 16, 2)
    assert(blocked == naive, s"blocked=$blocked naive=$naive")
    assert(naive.contains((10L, 1L)) && naive.contains((12L, 1L)) &&
      naive.contains((14L, 2L)) && naive.contains((18L, 1L)))
    assert(!naive.exists(_._1 == 17L), "the unrelated string must not link")
  }

  test("editJoin1: recall == naive on the registered q_fuzzy_link derivation at sf0.001") {
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
    val p = (lit(10) + col("c_custkey") % 9).cast("int")
    val dirty = cust.filter(col("c_custkey") % 7 === 3)
      .select(col("c_custkey").as("d_id"),
        concat(substr(col("c_name"), lit(1), p - 1),
          substr(col("c_name"), p + 1, lit(18) - p)).as("d_s"))
    val clean = cust.select(col("c_custkey").as("c_id"), col("c_name").as("c_s"))
    val naive = naivePairs(dirty, clean)
    val blocked = blockedPairs(dirty, clean, 16, 2)
    assert(blocked == naive, s"|blocked|=${blocked.size} |naive|=${naive.size}")
    // every dirty record re-links to its source
    val dirtyIds = dirty.select("d_id").as[Long].collect().toSet
    assert(dirtyIds.forall(id => naive.contains((id, id))))
  }

  test("editJoin1: tail-heavy split prunes candidates >10x vs the cross product") {
    // prune ratio GROWS with catalog size (buckets get relatively
    // smaller); sf0.001's 150-customer catalog only prunes ~5x, so this
    // measures at sf0.01 (1,500) where it is ~40x — and ~100x at sf0.1
    val cust = Tables.customer(spark, "/root/testdata/sf0.01")
    val p = (lit(10) + col("c_custkey") % 9).cast("int")
    val dirty = cust.filter(col("c_custkey") % 7 === 3)
      .select(col("c_custkey").as("d_id"),
        concat(substr(col("c_name"), lit(1), p - 1),
          substr(col("c_name"), p + 1, lit(18) - p)).as("d_s"))
    val clean = cust.select(col("c_custkey").as("c_id"), col("c_name").as("c_s"))
    // candidate count BEFORE the levenshtein verify (the work the
    // blocking saves); measured the same way the operator builds it
    val d = dirty.select(col("d_id"), col("d_s"))
    val c = clean.select(col("c_id"), col("c_s"))
    val byHead = d.withColumn("k", substring(col("d_s"), 1, 16))
      .join(c.withColumn("k", substring(col("c_s"), 1, 16)), Seq("k"))
    val byTail = d.withColumn("k", substring(col("d_s"), -2, 2))
      .join(c.withColumn("k", substring(col("c_s"), -2, 2)), Seq("k"))
    val candidates = byHead.unionByName(byTail)
      .select("d_id", "c_id").distinct().count()
    val naiveSize = dirty.count() * clean.count()
    assert(candidates * 10 < naiveSize,
      s"blocking must prune >10x: $candidates candidates vs $naiveSize cross pairs")
  }
}
