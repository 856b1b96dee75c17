package graft

import org.apache.spark.sql.functions._

/** Throwaway phase profiler for q_crossmodal_frames (r19 optimization
  * round, verdict item 3): attributes the composite's build time to
  * payload synthesis vs container decode vs the per-row UDF boundary —
  * the "batched columnar decode" candidate is only worth building if
  * the boundary (not the decode) dominates. Phases:
  *   synth-only        — AVI payload synthesis UDF, noop sink
  *   synth+decode      — synthesis UDF then frame-dHash UDF (the shipped
  *                       two-UDF composition)
  *   fused UDF         — ONE closure doing synth+decode (no intermediate
  *                       payload crossing an expression boundary)
  * fused ≈ synth+decode ⇒ the boundary is negligible and the residue is
  * genuine decode CPU.
  */
object CrossProf {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    import graft.ops.Codecs
    val aviUdf = udf((id: Long) => Codecs.synthAviNearAt(
      if (id % 3 == 0) id else 500000L + id % 200000L,
      (id % 2).toInt * 128, ((id / 3) % 8).toInt))
    val dhashUdf = udf((payload: Array[Byte]) =>
      Option(Codecs.aviFrameDHashes(payload)))
    val fusedUdf = udf((id: Long) => {
      val payload = Codecs.synthAviNearAt(
        if (id % 3 == 0) id else 500000L + id % 200000L,
        (id % 2).toInt * 128, ((id / 3) % 8).toInt)
      Option(Codecs.aviFrameDHashes(payload))
    })
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val docs = graft.core.Transforms.fanOut(
        Tables.documents(spark, d).select(col("doc_id")))
      t("synth-only") {
        docs.select(aviUdf(col("doc_id")).as("p"))
          .select(length(col("p")))
          .write.format("noop").mode("overwrite").save()
      }
      t("synth+decode (shipped)") {
        docs.select(col("doc_id"), dhashUdf(aviUdf(col("doc_id"))).as("sigs"))
          .select(col("doc_id"), posexplode(col("sigs")))
          .write.format("noop").mode("overwrite").save()
      }
      t("fused single UDF") {
        docs.select(col("doc_id"), fusedUdf(col("doc_id")).as("sigs"))
          .select(col("doc_id"), posexplode(col("sigs")))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
