package graft

import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the fuzzy-link family (r18 optimization
  * round): times editJoin's analysis pass, the candidate join, verify,
  * distinct, and the report tail separately at the bench SF. */
object LinkProf {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val cust = Tables.customer(spark, d)
    val dirty = {
      val p = (lit(10) + col("c_custkey") % 9).cast("int")
      val del = concat(substr(col("c_name"), lit(1), p - 1),
        substr(col("c_name"), p + 1, lit(18) - p))
      val q = (lit(3) + col("c_custkey") % 5).cast("int")
      cust.filter(col("c_custkey") % 7 === 3)
        .select(col("c_custkey").as("src_key"),
          concat(substr(del, lit(1), q - 1), lit("x"),
            substr(del, q + 1, length(del) - q)).as("d_s"))
    }
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      // full editJoin plan build (sampling + DP happens eagerly here)
      val pairs = t("editJoin plan (sampling+DP)") {
        graft.ops.Linkage.editJoin(dirty, "src_key", "d_s",
          cust, "c_custkey", "c_name", tau = 2)
      }
      t("pairs exec (cand+verify+dist)") {
        pairs.write.format("noop").mode("overwrite").save()
      }
      // stage-by-stage attribution of the candidate pipeline
      val dd = dirty.select(col("src_key").as("d_id"), col("d_s"))
      val cc = cust.select(col("c_custkey").as("c_id"), col("c_name").as("c_s"))
      def sample(df: org.apache.spark.sql.DataFrame, name: String): Seq[String] = {
        val total = df.count()
        val m = math.max(1L, total / 8192)
        df.select(col(name)).filter(col(name).isNotNull)
          .filter(pmod(xxhash64(col(name)), lit(m)) === 0)
          .limit(4 * 8192).collect().map(_.getString(0)).toIndexedSeq
      }
      val bounds = t("sampling+DP only") {
        graft.ops.Linkage.chooseSegmentation(
          sample(cc, "c_s"), sample(dd, "d_s"), 2)
      }
      t("dSeg explode only") {
        graft.ops.Linkage.dirtySegKeys(dd, 2, bounds)
          .write.format("noop").mode("overwrite").save()
      }
      t("cSeg explode only") {
        graft.ops.Linkage.cleanSegKeys(cc, 2, bounds)
          .write.format("noop").mode("overwrite").save()
      }
      val cand = graft.ops.Linkage.segmentCandidates(dd, cc, 2, bounds)
      t("cand count") { println("  n_cand=" + cand.count()) }
      t("cand join (even seg!) noop") {
        cand.write.format("noop").mode("overwrite").save()
      }
      t("cand+verify noop") {
        cand.withColumn("dist", levenshtein(col("d_s"), col("c_s"), 2))
          .filter(col("dist") =!= -1)
          .write.format("noop").mode("overwrite").save()
      }
      t("full q_fuzzy_link2 exec") {
        val per = pairs.groupBy("d_id")
          .agg(count(lit(1)).as("m"),
            sum(when(col("c_id") === col("d_id"), 1L).otherwise(0L)).as("t"))
        dirty.join(per, dirty("src_key") === per("d_id"), "left")
          .agg(count(lit(1)).as("n_dirty"),
            count(col("d_id")).as("n_linked"),
            sum(when(col("m") > 1, 1L).otherwise(0L)).as("n_ambiguous"),
            coalesce(sum("m"), lit(0L)).as("n_pairs"),
            coalesce(sum("t"), lit(0L)).as("n_true"))
          .write.format("noop").mode("overwrite").save()
      }
      // serve path: probe the prebuilt index
      val tbl = "graft_linkprof_idx"
      t("editIndexBuild (w/ exemplar)") {
        graft.ops.Linkage.editIndexBuild(cust, "c_custkey", "c_name",
          tau = 2, tableName = tbl, tableBuckets = 16,
          probeExemplar = Some((dirty, "d_s")))
      }
      val probe = t("editIndexProbe plan") {
        graft.ops.Linkage.editIndexProbe(spark, tbl, dirty, "src_key", "d_s")
      }
      t("probe exec") {
        probe.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
