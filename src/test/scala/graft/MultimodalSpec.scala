package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload columns, typed metadata decode
  * (stubbed codec), feature extraction, frame sampling. The Spark-side
  * mechanics (schema, partition-local decode, explode shapes) are the
  * thing under test.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Tables.documents(spark, sf).limit(100)
    .select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"))

  test("decodeMeta adds a typed meta struct, deterministic across runs") {
    val a = Multimodal.decodeMeta(media).select("media_id", "meta.*")
    assert(a.schema.fieldNames.toSeq ==
      Seq("media_id", "width", "height", "n_frames", "ok"))
    assert(a.filter(col("ok") && col("width") > 0 && col("height") > 0).count() == 100)
    val b = Multimodal.decodeMeta(media).select("media_id", "meta.*")
    assert(a.exceptAll(b).count() == 0, "decode must be deterministic")
  }

  test("extractFeatures emits fixed-width vectors usable by Similarity") {
    val feats = Multimodal.extractFeatures(media, dim = 16)
      .select(col("media_id").as("vec_id"), col("features"))
    assert(feats.filter(size(col("features")) === 16).count() == 100)
    val top = graft.ops.Similarity.bruteForceTopK(
      feats.filter(col("vec_id") < 3), feats, "vec_id", "features", 2)
    assert(top.count() == 6) // 3 queries x k=2
  }

  test("sampleFrames emits about n evenly spaced frames per row") {
    val sampled = Multimodal.sampleFrames(Multimodal.decodeMeta(media), n = 4)
    val perRow = sampled.groupBy("media_id").agg(count(lit(1)).as("k"))
    assert(perRow.count() == 100)
    // step = max(1, n_frames/4) → between 1 and ~5 samples per row
    assert(perRow.filter(col("k") < 1 || col("k") > 8).count() == 0)
    val bad = sampled.filter(col("frame_idx") < 0 ||
      col("frame_idx") >= col("meta.n_frames")).count()
    assert(bad == 0)
  }

  test("audioWindows: window grid, partial tail, RMS and zero crossings") {
    import spark.implicits._
    // 5 bytes: '@'=64 → 0, ' '=32 → -32, 'x'=120 → 56 ...
    val m = Seq((1L, "@ x @ ")).toDF("media_id", "txt")
      .select(col("media_id"), col("txt").cast("binary").as("payload"))
    val w = graft.ops.Multimodal.audioWindows(m, window = 4)
      .orderBy("w_idx").collect()
    assert(w.length == 2, s"6 samples / window 4 → full + partial")
    assert(w(0).getAs[Int]("n_samples") == 4 &&
      w(1).getAs[Int]("n_samples") == 2)
    // window 0 samples: 0, -32, 56, -32 → crossings at every pair
    // (0 is non-negative, so (0,-32) crosses too); rms = √(5184/4) = 36
    assert(w(0).getAs[Int]("zc") == 3, w(0).toString)
    assert(w(0).getAs[Double]("rms") == 36.0)
    // empty payload → zero windows
    val empty = Seq((2L, "")).toDF("media_id", "txt")
      .select(col("media_id"), col("txt").cast("binary").as("payload"))
    assert(graft.ops.Multimodal.audioWindows(empty).isEmpty)
  }
}
