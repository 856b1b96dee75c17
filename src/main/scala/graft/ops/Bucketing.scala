package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout co-located joins — the 100 TB answer to "this join
  * shuffles the fact table every single run".
  *
  * Writing both sides `bucketBy(n, key)` once means every subsequent
  * equi-join on that key is Exchange-free: each task reads bucket i of
  * both tables and sort-merge-joins them locally. At cluster scale the
  * one-time bucketed write replaces a per-query shuffle of the larger
  * table — the canonical amortization for a fact table joined on the
  * same key by many queries (kawa's `Message.Key` sharding generalized
  * to persistent layout; reference keys messages for exactly this
  * co-location purpose, types.go:13-14).
  *
  * Uses Spark's built-in datasource bucketing (in-memory catalog +
  * parquet — no Hive needed). Bucket counts must match on both sides
  * (Spark also joins k·n vs n buckets, but identical counts avoid the
  * bucket-coalescing read amplification).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table `name` (overwrite).
    * Drops any prior table AND its on-disk location first: with the
    * in-memory catalog a previous JVM's managed-table directory survives
    * in the warehouse while the catalog entry does not, and saveAsTable
    * refuses the orphaned location (LOCATION_ALREADY_EXISTS). The
    * recursive location delete is scoped to `warehouse/<name>` — callers
    * must treat bucketed-table names as owned by this helper (the
    * [[bucketedJoin]] defaults are suffixed with the Spark application
    * id precisely so two sessions sharing a warehouse cannot race on,
    * or destroy, each other's directories). */
  def writeBucketed(df: DataFrame, name: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)
  }

  /** [[writeBucketed]]'s orphaned-location cleanup for a PLAIN (non-
    * bucketed) managed table — side tables like the search index's
    * additive stats need the same prior-JVM-leftover handling. */
  def writeTable(df: DataFrame, name: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(name)
  }

  /** Append rows to an existing bucketed table written by
    * [[writeBucketed]] (same key + bucket count — Spark validates the
    * spec matches). Each append adds one file per non-empty bucket;
    * reads stay `Bucketed: true` with the partitioning intact, so
    * downstream co-located joins keep their zero-Exchange shape. This is
    * the incremental-maintenance path for persisted ANN indexes
    * ([[Similarity.lshIndexBuild]]/ivfIndexBuild): new corpus batches
    * append their signatures instead of rebuilding the index — at 100 TB
    * a rebuild rewrites everything, an append writes only the delta.
    * (Periodic compaction = one [[writeBucketed]] over the table when
    * per-bucket file counts grow.) */
  def appendBucketed(df: DataFrame, name: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)

  /** Rewrite a bucketed table in place, collapsing the one-file-per-
    * append accumulation of [[appendBucketed]] back to one file per
    * bucket. Reads the whole table (localCheckpoint materializes it
    * before the DROP — the read plan must not reference the files being
    * deleted), then [[writeBucketed]] the same rows under the same
    * spec. Same data, same layout contract, minimal file count — run it
    * when per-bucket file counts degrade scan/merge performance (each
    * bucket file is a separate sorted run for the SMJ reader). Returns
    * the row count rewritten. */
  def compactBucketed(spark: SparkSession, name: String, key: String,
      buckets: Int): Long = {
    val snapshot = spark.table(name).localCheckpoint()
    val n = snapshot.count()
    // bucket files are written per (task, bucket): co-locating each
    // bucket's rows in one task first (repartition uses the same
    // murmur3-pmod hash as the bucket spec) yields exactly one file per
    // non-empty bucket — without it the rewrite re-fragments
    writeBucketed(
      snapshot.repartition(buckets, org.apache.spark.sql.functions.col(key)),
      name, key, buckets)
    n
  }

  // ---- tombstone lifecycle (r15) ------------------------------------
  // Shared by every persisted index that supports retraction (the
  // fingerprint dedup index keyed by `fp`, the LSH index keyed by
  // `n_id`): deletes accumulate in a SMALL `<table>_del` side table,
  // probes anti-join it ([[liveView]] — broadcast, so the bucketed base
  // scan keeps its partitioning), appends CLEAR re-inserted keys
  // ([[clearTombstones]] — without it a deleted-then-re-inserted key
  // would be suppressed forever), and [[tombstoneCompact]] folds the
  // deletes into the base. The index is never rewritten per delete.

  /** Create an EMPTY tombstone table alongside a fresh index build.
    * Always materializing it (rather than creating lazily on the first
    * delete) is load-bearing for STREAMING probes: a stream plans the
    * [[liveView]] anti-join at definition time, so the `_del` table must
    * exist then for a later mid-stream delete to take effect — appends
    * to an existing static table re-resolve per micro-batch, a table
    * that appears mid-stream does not. Also discards any stale
    * tombstones of a previous same-name index. */
  def initTombstones(keySchema: DataFrame, keyCol: String,
      tableName: String): Unit =
    // eager: [[tombstoneCompact]] truncates by passing the _del table
    // itself as the schema source — materialize the empty result before
    // writeTable drops the table the plan reads
    writeTable(keySchema.select(keyCol).limit(0).localCheckpoint(true),
      tableName + "_del")

  /** Append retracted keys to the tombstone table (created if a legacy
    * index predates [[initTombstones]]). */
  def tombstoneAppend(delKeys: DataFrame, keyCol: String,
      tableName: String): Unit = {
    val spark = delKeys.sparkSession
    // eager: the caller may derive the delete set from the index itself
    val del = delKeys.select(keyCol).distinct().localCheckpoint(true)
    if (spark.catalog.tableExists(tableName + "_del"))
      del.write.mode(SaveMode.Append).format("parquet")
        .saveAsTable(tableName + "_del")
    else writeTable(del, tableName + "_del")
  }

  /** Remove re-inserted keys from the tombstone table — called by index
    * APPENDS: a key that was deleted and later re-enters the index must
    * stop being anti-joined away, or the re-inserted row is suppressed
    * forever (and a dedup gate would report it novel on every
    * subsequent batch). The tombstone table is small by contract, so
    * the rewrite is cheap.
    *
    * The rewrite only happens when a key is actually cleared: an append
    * with nothing tombstoned (the overwhelmingly common case) must NOT
    * touch the table's files — a RUNNING streaming probe has the
    * current file listing planned in, and a drop+recreate under it
    * fails the stream with FILE_NOT_EXIST. When a clear does rewrite,
    * treat it like [[compactBucketed]]: a maintenance op to run without
    * a live stream over the same index. */
  def clearTombstones(reinsertedKeys: DataFrame, keyCol: String,
      tableName: String): Unit = {
    val spark = reinsertedKeys.sparkSession
    if (!spark.catalog.tableExists(tableName + "_del")) return
    val del = spark.table(tableName + "_del")
    val remaining = del
      .join(reinsertedKeys.select(keyCol), Seq(keyCol), "left_anti")
      .localCheckpoint(true) // materialize before overwriting the table it reads
    if (remaining.count() < del.count()) writeTable(remaining, tableName + "_del")
  }

  /** The LIVE rows of a tombstoned index: base minus deleted keys. The
    * tombstone side is broadcast (small by contract — fold with
    * [[tombstoneCompact]] before it grows); a broadcast anti-join
    * preserves the base scan's bucketed partitioning, so probes keep
    * their zero-index-Exchange shape, and AQE's empty-relation
    * propagation removes the join entirely when nothing is deleted.
    * Indexes with no tombstone table read through unchanged. */
  def liveView(spark: SparkSession, tableName: String,
      keyCol: String): DataFrame = {
    val base = spark.table(tableName)
    if (!spark.catalog.tableExists(tableName + "_del")) base
    else base.join(
      org.apache.spark.sql.functions.broadcast(spark.table(tableName + "_del")),
      Seq(keyCol), "left_anti")
  }

  /** Fold tombstones into the base: rewrite the index to its live rows
    * (one file per bucket, the [[compactBucketed]] layout contract) and
    * truncate the tombstone table — truncate, NOT drop, so streams that
    * planned the [[liveView]] anti-join keep a valid (empty) table to
    * re-resolve. Probe results are unchanged by construction. Returns
    * the live row count. */
  def tombstoneCompact(spark: SparkSession, tableName: String,
      keyCol: String, bucketKey: String, buckets: Int): Long = {
    val live = liveView(spark, tableName, keyCol).localCheckpoint(true)
    val n = live.count()
    writeBucketed(
      live.repartition(buckets, org.apache.spark.sql.functions.col(bucketKey)),
      tableName, bucketKey, buckets)
    if (spark.catalog.tableExists(tableName + "_del"))
      initTombstones(spark.table(tableName + "_del"), keyCol, tableName)
    n
  }

  /** Bucket both inputs by the join key, then inner-join the bucketed
    * tables. The join itself is shuffle-free (zero Exchange — pinned in
    * PlanShapeSpec); with `sortBy` it is merge-ready too. Result multiset
    * is identical to `left.join(right, key)` — the oracle is the plain
    * equi-join.
    */
  def bucketedJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, buckets: Int,
      namePrefix: String = ""): DataFrame = {
    // Default prefix is per-application: concurrent sessions sharing one
    // warehouse dir must not DROP + delete each other's staging tables.
    val prefix = if (namePrefix.nonEmpty) namePrefix
      else "graft_bkt_" + spark.sparkContext.applicationId
        .replaceAll("[^A-Za-z0-9_]", "_")
    writeBucketed(left, s"${prefix}_l", key, buckets)
    writeBucketed(right, s"${prefix}_r", key, buckets)
    spark.table(s"${prefix}_l")
      .join(spark.table(s"${prefix}_r"), key)
  }
}
