package graft

import org.apache.spark.sql.functions._

/** Micro-benchmark for the persisted ANN index
  * ([[graft.ops.Similarity.lshIndexBuild]]/lshIndexProbe): the same
  * LSH top-k answered (a) from scratch per query batch — the corpus
  * signatures recomputed and joined fresh every time, the lshTopK path —
  * and (b) against the one-time bucketed signature table. Prints one
  * JSON line with the build cost, per-batch probe times, and the
  * break-even batch count. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IndexBench"
  *
  * The point at scale: the from-scratch path pays the corpus signature
  * computation + join-side materialization on EVERY batch, while the
  * probe path pays it once at build; at 100 TB the former is a full
  * corpus pass per batch and the latter touches co-located buckets
  * only. The break-even printed here is the number of query batches
  * after which the index write has paid for itself.
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "5").toInt.min(5)
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, sfDir)
    // LARGE query batches (20% of the corpus each, disjoint): the regime
    // the index exists for — too big to broadcast, so the from-scratch
    // path must recompute AND re-shuffle the corpus signatures per batch
    def batch(i: Int) = e.filter(col("vec_id") % 5 === i)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    // warm codegen/page cache on both paths before timing
    graft.ops.Similarity.lshTopKLargeBatch(batch(0), e, "vec_id", "embedding",
      dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
      .write.format("noop").mode("overwrite").save()

    val scratch = (0 until batches).map { i =>
      timed(graft.ops.Similarity.lshTopKLargeBatch(batch(i), e, "vec_id", "embedding",
          dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
        .write.format("noop").mode("overwrite").save())
    }
    val build = timed(graft.ops.Similarity.lshIndexBuild(
      e, "vec_id", "embedding", dim = 64,
      tableName = "graft_idxbench", tableBuckets = 16, bits = 6, tables = 4))
    val probe = (0 until batches).map { i =>
      timed(graft.ops.Similarity.lshIndexProbe(spark, "graft_idxbench",
          batch(i), "vec_id", "embedding",
          dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
        .write.format("noop").mode("overwrite").save())
    }
    val sMed = scratch.sorted.apply(batches / 2)
    val pMed = probe.sorted.apply(batches / 2)
    val breakEven = if (sMed > pMed) math.ceil(build / (sMed - pMed)).toInt else -1
    println(f"""{"metric":"lsh_index","build_s":$build%.3f,"scratch_per_batch_s":$sMed%.3f,"probe_per_batch_s":$pMed%.3f,"speedup":${sMed / pMed}%.2f,"breakeven_batches":$breakEven,"batches":$batches,"sf":"$sfDir"}""")
    spark.stop()
  }
}
