package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** [[graft.plans.VectorKernelRule]]: the declarative HOF vector math
  * must execute as the codegen kernels, bit-identically, and the
  * rewrite must not fire on look-alike folds it cannot prove.
  */
class VectorKernelRuleSpec extends SparkSpec {
  import graft.plans.VectorKernelRule.ENABLED_CONF

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding")).cache()

  test("HOF dot and cosine plans execute the graft kernels") {
    val df = emb.select(
      dotD(col("embedding"), col("embedding")).as("d"),
      cosineD(col("embedding"), reverse(col("embedding"))).as("c"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_dot"), "dot HOF must rewrite:\n" + p.take(600))
    assert(p.contains("graft_cosine"), "cosine HOF must rewrite:\n" + p.take(600))
    assert(!p.contains("aggregate(zip_with"),
      "no interpreted HOF fold should remain:\n" + p.take(600))
  }

  test("rewrite is bit-identical: rule on == rule off on real embeddings") {
    def run(): Array[(Long, Double, Double)] = emb.select(
        col("vec_id"),
        dotD(col("embedding"), reverse(col("embedding"))).as("d"),
        cosineD(col("embedding"), reverse(col("embedding"))).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val on = run()
    spark.conf.set(ENABLED_CONF, "false")
    val off = try run() finally spark.conf.set(ENABLED_CONF, "true")
    // exact double equality — the kernels promise the identical fold
    assert(on.sameElements(off), "kernel results must match the HOF bits")
    val offPlan = {
      spark.conf.set(ENABLED_CONF, "false")
      try emb.select(dotD(col("embedding"), col("embedding")))
        .queryExecution.executedPlan.toString
      finally spark.conf.set(ENABLED_CONF, "true")
    }
    assert(!offPlan.contains("graft_dot"), "flag off must keep the HOF form")
  }

  test("null and length semantics preserved through the rewrite") {
    import spark.implicits._
    val d = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, 4.0f)),
      (2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](3.0f, 4.0f)),
      (3L, Array[java.lang.Float](1.0f), Array[java.lang.Float](3.0f, 4.0f)),
      (4L, null.asInstanceOf[Array[java.lang.Float]], Array[java.lang.Float](1.0f)))
      .toDF("id", "a", "b")
    val out = d.select(col("id"), dotD(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(11.0))
    assert(out(2L).isEmpty, "null element must null the dot")
    assert(out(3L).isEmpty, "length mismatch must null the dot (zip pad)")
    assert(out(4L).isEmpty, "null array must null the dot")
  }

  test("look-alike folds do NOT rewrite (different init / op / finish)") {
    val sum1 = aggregate( // init 1.0, not 0.0
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (a, x) => a + x)
    val maxFold = aggregate( // max, not add
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (a, x) => greatest(a, x))
    val p = emb.select(sum1.as("s1"), maxFold.as("m")).queryExecution
      .executedPlan.toString
    assert(!p.contains("graft_dot"),
      "non-dot folds must stay untouched:\n" + p.take(600))
    // l2sqD's (x-y)^2 fold must also survive unrewritten and correct
    val l2 = emb.select(l2sqD(col("embedding"), col("embedding")).as("z"))
      .agg(max(abs(col("z")))).collect()(0).getDouble(0)
    assert(l2 == 0.0)
  }
}
