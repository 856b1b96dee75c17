package graft

import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN recall on STRUCTURED embeddings (r12; the r11 verdict's item 6).
  *
  * The driver's synthetic embeddings are near-uniform random — the
  * hardest possible case for every space-partitioning index, which is
  * why the in-query bounds over testdata sit at 0.4–0.5 (kept, as the
  * adversarial pins). Real embedding corpora are CLUSTERED; this spec
  * generates a deterministic seeded mixture of Gaussians (8 centers in
  * R⁶⁴, σ = 0.25 noise — tight, well-separated clusters) and pins the
  * recall the same index parameters deliver when the data has the
  * structure the indexes exploit: ≥ 0.8 for LSH, IVF cell-pruning, and
  * IVFADC.
  */
class StructuredEmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic mixture of Gaussians: same seed → bit-identical corpus
  private lazy val mog: DataFrame = {
    val rnd = new java.util.Random(4242)
    val centers = Array.fill(8, 64)(rnd.nextGaussian())
    val rows = (0 until 2000).map { i =>
      val c = centers(i % 8)
      val v = new Array[Float](64)
      var j = 0
      while (j < 64) {
        v(j) = (c(j) + 0.25 * rnd.nextGaussian()).toFloat
        j += 1
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private def recallAt5(approx: DataFrame, exact: Set[(Long, Long)]): Double = {
    val got = approx.select("q_id", "n_id")
      .as[(Long, Long)].collect().toSet
    (exact & got).size.toDouble / exact.size
  }

  private lazy val queries = mog.filter(col("vec_id") < 10)
  private lazy val exactCos =
    Similarity.bruteForceTopK(queries, mog, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet

  test("LSH recall@5 ≥ 0.8 on mixture-of-Gaussians embeddings (same params as q_sim_lsh)") {
    val lsh = Similarity.lshTopK(queries, mog, "vec_id", "embedding",
      dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
    val r = recallAt5(lsh, exactCos)
    assert(r >= 0.8, f"LSH recall on clustered data: $r%.2f")
  }

  test("IVF recall@5 ≥ 0.8 on mixture-of-Gaussians embeddings") {
    val ivf = Similarity.ivfTopK(queries, mog, "vec_id", "embedding",
      k = 5, nlist = 32, nprobe = 4)
    val r = recallAt5(ivf, exactCos)
    assert(r >= 0.8, f"IVF recall on clustered data: $r%.2f")
  }

  test("IVFADC nprobe=2 recall@5 ≥ 0.8 vs the exhaustive ADC scan on clustered data") {
    val cb = Similarity.pqTrain(mog, "vec_id", "embedding", m = 4, k = 16, iters = 3)
    val coarse = Similarity.kmeansFit(mog, "vec_id", "embedding",
      k = 8, iters = 3, cosine = false)
    val tbl = "graft_spec_mog_ivfpq"
    Similarity.ivfPqIndexBuild(mog, "vec_id", "embedding", cb, coarse, tbl,
      tableBuckets = 4)
    val full = Similarity.pqTopKL2(queries,
        Similarity.pqEncode(mog, "embedding", cb), cb,
        "vec_id", "embedding", "vec_id", "pq_code", k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val pruned = Similarity.ivfPqProbe(spark, tbl, queries,
      "vec_id", "embedding", cb, coarse, k = 5, nprobe = 2)
    val r = recallAt5(pruned, full)
    assert(r >= 0.8, f"IVFADC cell-pruning recall on clustered data: $r%.2f")
  }

  test("residual IVFADC end-to-end recall@5 ≥ 0.8 vs exact L2 on clustered data") {
    // IVFADC ranks by L2, so the exact baseline must be L2 too (cosine
    // and L2 orderings genuinely diverge on unnormalized mixtures), and
    // no self-filter — the probes keep self-pairs.
    import graft.functions.VectorFunctions.l2sqN
    val qv = queries.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val exactL2 = broadcast(qv)
      .crossJoin(mog.select(col("vec_id").as("n_id"), col("embedding").as("nv")))
      .withColumn("d", l2sqN(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("d").asc, col("n_id"))))
      .filter(col("rnk") <= 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val coarse = Similarity.kmeansFit(mog, "vec_id", "embedding",
      k = 8, iters = 3, cosine = false)
    // residual IVFADC candidates (ADC top-50) + exact re-rank to top-5 —
    // the FAISS serving pipeline. Direct ADC-ranked top-5 cannot pin
    // 0.8 on this geometry at ANY practical code budget: within-cluster
    // squared-distance gaps (~0.05–0.5) sit below the quantization
    // noise (~0.6 even at m=16,k=32), so the refine stage is the load-
    // bearing step, not an optimization.
    val cbRes = Similarity.ivfPqResidualIndexBuild(mog, "vec_id", "embedding",
      coarse, m = 16, k = 32, iters = 3, "graft_spec_mog_res", tableBuckets = 4)
    val cands = Similarity.ivfPqResidualProbe(spark, "graft_spec_mog_res",
      queries, "vec_id", "embedding", cbRes, coarse, k = 50, nprobe = 2)
    val refined = Similarity.refineTopK(cands, queries, mog,
      "vec_id", "embedding", k = 5)
    val e2e = recallAt5(refined, exactL2)
    assert(e2e >= 0.8, f"residual IVFADC + refine end-to-end recall: $e2e%.2f")
    // the exact re-rank returns true distances: its top-5 ⊆ ADC top-50
    // by construction, and the candidate set's own recall bounds e2e
    val candRecall = recallAt5(cands, exactL2)
    assert(candRecall >= e2e, "refine cannot exceed its candidate recall")
  }
}
