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
