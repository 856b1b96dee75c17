package graft.ops

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star row: image/audio/video as opaque
  * binary columns with typed metadata).
  *
  * The Spark-side mechanics are real and tested: binary payload columns,
  * a typed metadata struct, partition-friendly batch decode via
  * `mapPartitions`, and feature columns sized for downstream similarity
  * ops. The actual codec calls are STUBBED (this container ships no
  * image/audio libraries): `decodeStub` derives deterministic fake
  * metadata/features from the bytes, clearly marked below. Swapping in a
  * real decoder changes only the function body — schema, batching and
  * plan shape stay identical.
  *
  * Scale notes: decode is a narrow per-partition pass (no shuffle); frame
  * sampling explodes bounded arrays; feature extraction emits fixed-width
  * float arrays that feed [[Similarity]] unchanged.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType)))

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("ok", BooleanType)))

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real build replaces this body with an actual codec (e.g. javax
    * imageio / ffmpeg bindings); everything around it is production
    * plumbing. */
  private[ops] def decodeStub(payload: Array[Byte]): (Int, Int, Int, Boolean) = {
    if (payload == null || payload.isEmpty) (0, 0, 0, false)
    else {
      val h = java.util.Arrays.hashCode(payload)
      (math.abs(h % 1920) + 1, math.abs((h >> 8) % 1080) + 1,
        math.abs((h >> 16) % 300) + 1, true)
    }
  }

  /** STUB feature extractor: deterministic fixed-width pseudo-embedding
    * from payload bytes (stands in for a vision/audio model forward
    * pass). */
  private[ops] def featuresStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload != null && payload.nonEmpty) {
      var i = 0
      var h = 1125899906842597L
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      var j = 0
      while (j < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(j) = (h.toDouble / Long.MaxValue).toFloat
        j += 1
      }
    }
    out
  }

  /** Decode metadata for each media row: adds a typed `meta` struct.
    * A struct-returning Scala UDF rather than an RDD mapPartitions pass —
    * the decode itself is opaque JVM code either way, but the UDF form
    * keeps the surrounding plan in Tungsten rows and whole-stage codegen
    * (no Row re-encoding round-trip), and column pruning/pushdown still
    * apply to everything before and after. Narrow, no shuffle. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val decodeUdf = udf((payload: Array[Byte]) => {
      val (w, h, f, ok) = decodeStub(payload)
      (w, h, f, ok)
    }) // deterministic stub → leave Catalyst free to reorder around it
    media.withColumn("meta",
      decodeUdf(col("payload")).cast(metaSchema))
  }

  /** STUB resize: deterministically "re-encode" the payload to a target
    * box — real builds swap the body for an actual scaler. Keeps the
    * (payload, meta) contract: output columns are the resized payload and
    * an updated meta struct. */
  def resize(withMeta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scaleUdf = udf((payload: Array[Byte], w: Int, h: Int) => {
      if (payload == null || w <= 0 || h <= 0) payload
      else {
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val outLen = math.max(1, (payload.length * scale * scale).toInt)
        java.util.Arrays.copyOf(payload, math.min(outLen, payload.length))
      }
    })
    withMeta
      .withColumn("payload",
        scaleUdf(col("payload"), col("meta.width"), col("meta.height")))
      .withColumn("meta", struct(
        least(col("meta.width"), lit(maxW)).as("width"),
        least(col("meta.height"), lit(maxH)).as("height"),
        col("meta.n_frames").as("n_frames"),
        col("meta.ok").as("ok")))
  }

  /** Extract a fixed-width float feature vector per media row. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val featUdf = udf((payload: Array[Byte]) => featuresStub(payload, dim))
    media.withColumn("features", featUdf(col("payload")))
  }

  /** STUB PCM decode: one centered sample per payload byte (stands in
    * for an audio codec's sample stream; swap the body for a real
    * decoder). Deterministic, SQL-replayable (byte − 64). */
  private[ops] def pcmStub(payload: Array[Byte]): Array[Int] =
    if (payload == null) Array.empty
    else payload.map(b => (b & 0xFF) - 64)

  /** Fixed-size audio analysis windows over the decoded sample stream:
    * one output row per window with RMS energy and zero-crossing count
    * (the two features every VAD/segmentation front-end starts from).
    * The trailing partial window is kept (flagged by `n_samples`).
    *
    * Scale shape: decode + window is one narrow UDF pass per media row
    * exploding to len/window rows — no shuffle; downstream aggregation
    * keys on whatever the caller groups by. The UDF is the honest
    * boundary: audio decode is opaque JVM code under any real codec
    * too, and everything around it stays Tungsten/codegen. */
  def audioWindows(media: DataFrame, window: Int = 16): DataFrame = {
    val wUdf = udf((payload: Array[Byte]) => {
      val s = pcmStub(payload)
      s.grouped(window).zipWithIndex.map { case (win, i) =>
        val n = win.length
        val rms = math.sqrt(win.map(x => x.toDouble * x).sum / n)
        val zc = win.sliding(2)
          .count(p => p.length == 2 && (p(0) < 0) != (p(1) < 0))
        (i, n, rms, zc)
      }.toSeq
    })
    media.withColumn("w", explode(wUdf(col("payload"))))
      .select(media.columns.toIndexedSeq.map(col) ++ Seq(
        col("w._1").as("w_idx"), col("w._2").as("n_samples"),
        col("w._3").as("rms"), col("w._4").as("zc")): _*)
  }

  // ---- real-codec paths (RIFF/WAVE + BMP via [[Codecs]]) ----

  /** Decode real WAV headers: adds `wav_meta` struct
    * (channels, sample_rate, bits, n_frames, ok). Unlike [[decodeMeta]]'s
    * stub this runs [[Codecs.parseWav]] — genuine chunk-walking over the
    * payload bytes. Narrow per-row pass, same UDF plumbing contract. */
  def decodeWavMeta(media: DataFrame): DataFrame = {
    val u = udf((payload: Array[Byte]) =>
      Codecs.parseWav(payload) match {
        case Some(m) => (m.channels, m.sampleRate, m.bitsPerSample, m.nFrames, true)
        case None => (0, 0, 0, 0, false)
      })
    media.withColumn("wav_meta", u(col("payload")).cast(StructType(Seq(
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("ok", BooleanType)))))
  }

  /** Exact integer energy (Σ s²) and zero-crossing count over the real
    * 16-bit PCM stream — the [[audioWindows]] feature pair computed from
    * genuinely decoded samples instead of the byte stub. Integer outputs
    * keep the DuckDB twin float-free. */
  def wavSignalStats(media: DataFrame): DataFrame = {
    val u = udf((payload: Array[Byte]) => {
      val s = Codecs.decodeWavPcm16(payload)
      var energy = 0L; var zc = 0L; var i = 0
      while (i < s.length) {
        energy += s(i).toLong * s(i)
        if (i > 0 && (s(i - 1) < 0) != (s(i) < 0)) zc += 1
        i += 1
      }
      (s.length, energy, zc)
    })
    media.withColumn("sig", u(col("payload")).cast(StructType(Seq(
      StructField("n_samples", IntegerType),
      StructField("energy", LongType),
      StructField("zc", LongType)))))
  }

  /** Decode real BMP headers + 24bpp pixel walk: adds `bmp_meta`
    * (width, height, bpp, ok) and `pixel_sum` (Σ of all B/G/R bytes,
    * -1 on parse failure) via [[Codecs.parseBmp]]/[[Codecs.bmpPixelSum]]
    * — offset, stride and bottom-up row-order logic on real bytes. */
  def decodeBmpMeta(media: DataFrame): DataFrame = {
    val u = udf((payload: Array[Byte]) => {
      val m = Codecs.parseBmp(payload)
      (m.map(_.width).getOrElse(0), m.map(_.height).getOrElse(0),
        m.map(_.bitsPerPixel).getOrElse(0), m.isDefined,
        Codecs.bmpPixelSum(payload))
    })
    media
      .withColumn("dec", u(col("payload")).cast(StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("bpp", IntegerType),
        StructField("ok", BooleanType),
        StructField("pixel_sum", LongType)))))
      .withColumn("bmp_meta", struct(col("dec.width").as("width"),
        col("dec.height").as("height"), col("dec.bpp").as("bpp"),
        col("dec.ok").as("ok")))
      .withColumn("pixel_sum", col("dec.pixel_sum"))
      .drop("dec")
  }

  /** Perceptual 64-bit image fingerprint (dHash over REAL decoded
    * pixels — [[Codecs.bmpDHash]]'s 9×8 integer-grayscale comparison
    * grid) per media row: (id, sig), null sig for undecodable payloads.
    * One narrow per-row pass, no shuffle; feed the result to
    * [[Dedup.hammingNearDup]] for the banded near-duplicate join — the
    * image column of the dedup × multimodal north star. */
  def imageDHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val u = udf((payload: Array[Byte]) =>
      Option(Codecs.bmpDHash(payload)).map(_.longValue))
    media.select(col(idCol).as("id"), u(col(payloadCol)).as("sig"))
  }

  /** Perceptual 64-bit audio fingerprint ([[Codecs.wavFingerprint]] —
    * 65-window integer energy comparisons over real decoded PCM) per
    * media row: (id, sig), null sig for undecodable payloads. The audio
    * sibling of [[imageDHash]]; both feed [[Dedup.hammingNearDup]]. */
  def audioFingerprint(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val u = udf((payload: Array[Byte]) =>
      Option(Codecs.wavFingerprint(payload)).map(_.longValue))
    media.select(col(idCol).as("id"), u(col(payloadCol)).as("sig"))
  }

  /** Decode real AVI containers: adds `avi_meta` (width, height,
    * n_frames, us_per_frame, ok) and `pixel_sum` (Σ of all B/G/R bytes
    * over EVERY frame, -1 on parse failure) via
    * [[Codecs.parseAvi]]/[[Codecs.aviPixelSum]] — RIFF list walk,
    * per-frame '00db' offsets, padded-stride bottom-up frame layout. */
  def decodeAviMeta(media: DataFrame): DataFrame = {
    val u = udf((payload: Array[Byte]) => {
      val m = Codecs.parseAvi(payload) // ONE container walk per row
      (m.map(_.width).getOrElse(0), m.map(_.height).getOrElse(0),
        m.map(_.nFrames).getOrElse(0), m.map(_.usPerFrame).getOrElse(0L),
        m.isDefined,
        m.map(Codecs.aviPixelSum(payload, _)).getOrElse(-1L))
    })
    media
      .withColumn("dec", u(col("payload")).cast(StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("n_frames", IntegerType),
        StructField("us_per_frame", LongType),
        StructField("ok", BooleanType),
        StructField("pixel_sum", LongType)))))
      .withColumn("avi_meta", struct(col("dec.width").as("width"),
        col("dec.height").as("height"), col("dec.n_frames").as("n_frames"),
        col("dec.us_per_frame").as("us_per_frame"), col("dec.ok").as("ok")))
      .withColumn("pixel_sum", col("dec.pixel_sum"))
      .drop("dec")
  }

  /** REAL image resize (r13 — replaces the stub for BMP payloads): adds
    * `payload_resized`, a re-encoded 24bpp BMP downsampled by an exact
    * integer box filter ([[Codecs.resizeBmp24]]); null for undecodable
    * payloads. One narrow per-row pass; the output feeds every other
    * BMP op unchanged (decode, dHash, pixel stats). */
  def resizeImages(media: DataFrame, factor: Int,
      payloadCol: String = "payload"): DataFrame = {
    val u = udf((payload: Array[Byte]) => Codecs.resizeBmp24(payload, factor))
    media.withColumn("payload_resized", u(col(payloadCol)))
  }

  /** REAL image feature extraction (r13 — replaces the stub for BMP
    * payloads): (id, features) with the 72-dim integer-exact grayscale
    * grid ([[Codecs.bmpGrayFeatures]]); null features for undecodable
    * payloads. The output feeds [[Similarity]]'s vector ops unchanged —
    * decode → feature-extract → kNN/ANN on real bytes. */
  def imageFeatures(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val u = udf((payload: Array[Byte]) =>
      Option(Codecs.bmpGrayFeatures(payload)).map(_.toSeq))
    media.select(col(idCol).as("id"), u(col(payloadCol)).as("features"))
  }

  /** Perceptual 64-bit video fingerprint — [[Codecs.aviKeyframeDHash]]
    * (frame-0 dHash, the thumbnail/keyframe near-dup technique) per
    * media row: (id, sig), null for undecodable payloads. The video
    * sibling of [[imageDHash]]/[[audioFingerprint]] — all three feed
    * [[Dedup.hammingNearDup]]. */
  def videoKeyframeDHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val u = udf((payload: Array[Byte]) =>
      Option(Codecs.aviKeyframeDHash(payload)).map(_.longValue))
    media.select(col(idCol).as("id"), u(col(payloadCol)).as("sig"))
  }

  /** Per-frame dHash signatures — [[videoKeyframeDHash]] generalized to
    * EVERY decoded frame (r15): one row per (media, frame), so banding
    * over the result catches a still reused at ANY frame offset, not
    * just the thumbnail. One decode per media row (the per-frame
    * offsets come from a single container walk —
    * [[Codecs.aviFrameDHashes]]), then a narrow posexplode; the corpus
    * never shuffles to be fingerprinted. Output: (id, frame_idx, sig).
    */
  def videoFrameDHashes(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val u = udf((payload: Array[Byte]) =>
      Option(Codecs.aviFrameDHashes(payload)))
    media.select(col(idCol).as("id"), u(col(payloadCol)).as("sigs"))
      .select(col("id"), posexplode(col("sigs")).as(Seq("frame_idx", "sig")))
  }

  /** Sample up to `n` frame indices per media row, evenly spaced over the
    * decoded frame count — one output row per sampled frame. */
  def sampleFrames(withMeta: DataFrame, n: Int): DataFrame =
    withMeta
      .withColumn("frame_idx",
        explode(
          when(col("meta.n_frames") >= 1,
            sequence(lit(0), col("meta.n_frames") - 1,
              greatest(lit(1), (col("meta.n_frames") / n).cast("long"))))
            .otherwise(array().cast("array<bigint>"))))
}
