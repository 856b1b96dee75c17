package graft

import org.apache.spark.sql.functions._

/** Throwaway phase profiler for q_sim_ivfpq_refine (r18 optimization
  * round) — times each sub-step of the composite on the bench SF. */
object RefineProf {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val e = t("clustered+checkpoint") {
        val base = graft.Tables.embeddings(spark, d).select(
          col("vec_id"),
          transform(col("embedding"), (x, i) =>
            ((col("label") * 37 + i * 17) % 13 - 6).cast("double")
              + x.cast("double")).as("embedding"),
          col("label"))
        val fanned = if (sys.env.contains("PROF_FANOUT"))
          graft.core.Transforms.fanOut(base) else base
        fanned.localCheckpoint()
      }
      val coarse = t("kmeansFit k=10 it=3") {
        graft.ops.Similarity.kmeansFit(e, "vec_id", "embedding",
          k = 10, iters = 3, cosine = false)
      }
      val tbl = "graft_prof_idx"
      // replicate ivfPqResidualIndexBuild's internals with per-step timing
      val withRes = t("withRes plan") {
        import graft.functions.VectorFunctions._
        e.withColumn("_cell", call_function("graft_centroid_argmax",
            transform(col("embedding"), _.cast("double")),
            typedlit(coarse.flatten.toIndexedSeq),
            typedlit(coarse.map(c => c.map(x => x * x).sum / 2).toIndexedSeq)))
          .withColumn("_res", zip_with(
            transform(col("embedding"), _.cast("double")),
            element_at(typedlit(coarse.map(_.toIndexedSeq).toIndexedSeq),
              col("_cell") + 1), (x, c) => x - c))
      }
      val cb = t("pqTrain m=16 k=32 it=3") {
        graft.ops.Similarity.pqTrain(withRes, "vec_id", "_res", 16, 32, 3)
      }
      t("encode+write") {
        val coded = graft.ops.Similarity.pqEncode(withRes, "_res", cb)
          .select(col("vec_id").as("n_id"), col("pq_code"), col("_cell").as("cell"))
        graft.ops.Bucketing.initTombstones(coded, "n_id", tbl)
        graft.ops.Bucketing.writeBucketed(graft.ops.Bucketing.withGen(coded, 0L),
          tbl, "cell", 8)
      }
      val queries = e.filter(col("vec_id") < 5)
      val cands = t("probe plan") {
        graft.ops.Similarity.ivfPqResidualProbe(spark, tbl, queries,
          "vec_id", "embedding", cb, coarse, k = 50, nprobe = 4)
      }
      val refined = graft.ops.Similarity.refineTopK(cands, queries, e,
        "vec_id", "embedding", k = 5)
      t("probe+refine+report exec") {
        // same report tail as the query
        val qv = queries.select(col("vec_id").as("q_id"), col("embedding").as("_qv"))
        val wx = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("_d").asc, col("n_id"))
        val exact = broadcast(qv)
          .crossJoin(e.select(col("vec_id").as("n_id"), col("embedding").as("_nv")))
          .withColumn("_d", graft.functions.VectorFunctions.l2sqN(col("_qv"), col("_nv")))
          .withColumn("_rnk", row_number().over(wx))
          .filter(col("_rnk") <= 5)
          .select(col("q_id"), col("n_id"), lit(1).as("_hit"))
        val recall = refined.select("q_id", "n_id")
          .join(exact, Seq("q_id", "n_id"), "left")
          .groupBy("q_id")
          .agg((sum(coalesce(col("_hit"), lit(0))) / 5.0).as("_r"))
          .agg(avg("_r").as("_recall"))
        refined.crossJoin(broadcast(recall))
          .select(col("q_id"), col("rnk"), col("n_id"),
            round(col("dist"), 4).as("dist"),
            (col("_recall") >= 0.8).as("recall_ok"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
