package graft

import graft.ops.SkewJoins
import org.apache.spark.sql.functions._

/** Salted skew-join semantics (exact equivalence to the plain equi-join)
  * and the scale property it exists for: every shuffle keyed on
  * (key, salt), never on the bare hot key. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = (1 to 900).map(i => (7L, s"hot$i")) // one hot key
    .++(Seq((1L, "a"), (2L, "b"), (3L, "c")))
    .toDF("k", "payload")
  private def dim = Seq((1L, "one"), (2L, "two"), (7L, "seven"))
    .toDF("dk", "name")

  test("inner salted join equals plain inner join exactly (multiset)") {
    val plain = skewed.join(dim, $"k" === $"dk")
    val salted = SkewJoins.saltedEquiJoin(skewed, dim, "k", "dk", salts = 4)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == 902) // 900 hot + k=1 + k=2
  }

  test("left salted join preserves unmatched big rows exactly once") {
    val out = SkewJoins.saltedEquiJoin(skewed, dim, "k", "dk", salts = 4,
      joinType = "left")
    assert(out.count() == 903)
    val unmatched = out.filter($"dk".isNull).select("k").as[Long].collect()
    assert(unmatched.toSeq == Seq(3L))
  }

  test("hot key actually spreads across salt partitions") {
    val salted = skewed.withColumn("_s",
      pmod(xxhash64(skewed.columns.toIndexedSeq.map(col): _*), lit(4)))
    val spread = salted.filter($"k" === 7L)
      .groupBy("_s").count().count()
    assert(spread >= 3, s"900 distinct hot rows must land on ≥3 of 4 salts, got $spread")
  }

  test("plan: with broadcast off, both exchanges partition on (key, salt)") {
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = SkewJoins.saltedEquiJoin(skewed, dim, "k", "dk", salts = 4)
        .queryExecution.executedPlan.toString
      val parts = "hashpartitioning\\(([^)]*)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(parts.nonEmpty, p.take(800))
      assert(parts.forall(_.contains("_graft_salt")),
        s"every shuffle must carry the salt, saw: $parts")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }
}
