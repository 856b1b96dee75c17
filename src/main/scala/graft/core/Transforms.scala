package graft.core

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** The transform library — the engine's `Handler` surface
  * (/root/reference/types.go:122-135: one message in, 0..N out, possibly a
  * different type).
  *
  * Column-first: `select`/`where`/`withColumn` compile to Catalyst plans
  * (predicate pushdown, pruning, codegen for free — SURVEY §4). The typed
  * `flatMap` escape hatch is the literal Handler shape for logic SQL can't
  * express; empty output = filter-out, matching the reference's
  * empty-slice-means-processed idiom (types.go:123-126).
  */
object Transforms {
  /** Identity — the reference's `Pipe` (types.go:137-145). */
  def pipe: DataFrame => DataFrame = identity

  def select(cols: Column*): DataFrame => DataFrame = _.select(cols: _*)

  def where(cond: Column): DataFrame => DataFrame = _.filter(cond)

  def withColumn(name: String, c: Column): DataFrame => DataFrame =
    _.withColumn(name, c)

  /** Materialization barrier: evaluate `e` exactly once per row by routing
    * it through a single-element explode. The Generate node this plants is
    * opaque to CollapseProject, so downstream expressions reference the
    * result as a bound attribute instead of having the whole expression
    * tree inlined at every use site. Essential for expensive array-valued
    * expressions consumed by higher-order functions: without it, e.g. a
    * tokenize→shingle pipeline referenced via 3 element_at calls inside a
    * transform() lambda re-runs regexp+split O(|array|) times per row
    * (measured 32 s → 0.5 s on a 5k-doc shingling pass at sf0.1). */
  def materialized(df: DataFrame, name: String, e: Column): DataFrame =
    df.withColumn(name, explode(array(e)))

  /** Ensure at least the session's default parallelism before a
    * CPU-heavy narrow stage. Small inputs (one parquet file → one split)
    * otherwise pin e.g. a whole-corpus tokenization onto a single task. A
    * no-op when the scan already has enough splits, so at real scale (many
    * files / row groups) no extra shuffle is introduced.
    *
    * The split estimate reads the ANALYZED plan (leaf files + logical size
    * stats / maxPartitionBytes) — deliberately NOT `df.rdd`, which compiles
    * the full physical plan on the driver once per call just to read a
    * partition count (wasted driver work in a hot compile path at scale).
    * Non-file sources (in-memory relations report no input files) take the
    * repartition: the safe side for a CPU-heavy downstream stage — as do
    * streaming inputs (inputFiles asserts batch-only, and a micro-batch's
    * parallelism is otherwise whatever the source handed it). */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.isStreaming) return df.repartition(target)
    val files = df.inputFiles.length
    val estSplits =
      if (files == 0) 0L
      else {
        val maxPart = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
        val bytes = df.queryExecution.analyzed.stats.sizeInBytes
        math.max(files.toLong, (bytes / math.max(maxPart, 1L)).toLong)
      }
    if (estSplits < target) df.repartition(target) else df
  }

  /** Salted equi-join for skewed keys. AQE's skew-join split handles most
    * cases at runtime; this is the explicit variant for when a single key's
    * rows exceed what one task should hold even after splitting (classic
    * hot-tenant shape). The left (large, skewed) side derives a
    * deterministic salt from `tieBreak`; the right side is replicated
    * `salt` times, so the join key becomes (key, salt) and the hot key
    * spreads over `salt` tasks. Result is row-identical to a plain join.
    * This is the USING-join convenience (same key name both sides, keys
    * merged, inner only); for differently-named keys or left-outer of the
    * big side use [[graft.ops.SkewJoins.saltedEquiJoin]]. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      tieBreak: String, salt: Int): DataFrame = {
    val l = left.withColumn("_salt", pmod(hash(col(tieBreak)), lit(salt)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase distinct count for skewed groups: distinct values of a hot
    * key are first counted within hash-salted sub-groups (each sub-count
    * exact, because a value's salt is a function of the value), then
    * summed. Equal to count_distinct, but the per-key distinct set never
    * assembles on a single reducer. */
  def saltedCountDistinct(df: DataFrame, keyCol: String, valueCol: String,
      salt: Int, outName: String = "n_distinct"): DataFrame =
    df.groupBy(col(keyCol), pmod(hash(col(valueCol)), lit(salt)).as("_salt"))
      .agg(count_distinct(col(valueCol)).as("_part"))
      .groupBy(keyCol)
      .agg(sum("_part").as(outName))

  /** Column form of the attributes chain-merge ([[Message.mergeAttributes]],
    * types.go:28-30): overlay the `over` layer onto `base`, later layer
    * winning. Implemented by filtering `over`'s keys out of `base` before
    * the concat, so the result is independent of the session's
    * spark.sql.mapKeyDedupPolicy; null layers read as empty. */
  def layerAttributes(base: Column, over: Column): Column = {
    val emptyMap = map().cast("map<string,string>")
    val b = coalesce(base, emptyMap)
    val o = coalesce(over, emptyMap)
    map_concat(map_filter(b, (k, _) => !map_contains_key(o, k)), o)
  }

  /** Streaming corpus dedup as a Pipeline.via one-liner: normalized-text
    * fingerprint + dropDuplicatesWithinWatermark. Re-ingestions of the
    * same document (case/whitespace variants included) are dropped across
    * micro-batches within the watermark horizon — the at-least-once →
    * effectively-once property of the conformance suite
    * (/root/reference/test/suite_test.go:95-104) as a corpus operator.
    * Adds the `fp` column; state is bounded by the watermark. */
  def dedupByFingerprint(text: Column, tsCol: String,
      watermark: String): DataFrame => DataFrame =
    df => df.withColumn("fp", graft.functions.TextFunctions.fingerprint(text))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("fp"))

  /** Typed Handler: 1 → 0..N, possibly different type (types.go:127-129).
    * Prefer Column transforms; this is the escape hatch. */
  def handler[A: Encoder, B: Encoder](f: A => Seq[B]): Dataset[A] => Dataset[B] =
    _.flatMap(f)(implicitly[Encoder[B]])

  /** `DeserializationSource` parity (types.go:169-195): decode the opaque
    * `value` bytes as JSON into typed columns, keeping the envelope
    * (key/topic/attributes) alongside — late-bound schema, like the
    * reference's user-supplied `DeserFunc`. */
  def deserializeJson(schema: StructType): DataFrame => DataFrame =
    df => df.withColumn("parsed",
        from_json(col("value").cast("string"), schema))
      .select(col("key"), col("topic"), col("attributes"), col("parsed.*"))

  /** Fan-out split (the scanner-style one-line-to-records Handler,
    * SURVEY §2.1 O5): split `value` text on a delimiter into one message
    * per token, envelope preserved. */
  def splitValue(delimiter: String): DataFrame => DataFrame =
    df => df.withColumn("value",
        explode(split(col("value").cast("string"), java.util.regex.Pattern.quote(delimiter))))
      .withColumn("value", col("value").cast("binary"))
}
