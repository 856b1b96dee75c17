package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-order), the write-side
  * complement to predicate pushdown: range-partitioning and sorting a
  * 100 TB table by the interleaved bits of two filter columns makes a
  * scan with predicates on EITHER column prune most files (min/max
  * footer stats become selective on both dimensions), where a plain
  * sort only prunes on its leading column.
  *
  * The Z-value is computed with the classic magic-number bit spreading —
  * pure integer arithmetic on codegen'd built-ins (shiftleft / bitwise
  * and / or), no UDF, so the clustering write stays in whole-stage
  * codegen at any scale.
  */
object Layout {

  /** Spread the low 16 bits of `v` so bit i lands at position 2i.
    * Standard Morton-code dilation. Inputs are masked to 16 bits first,
    * so keys ≥ 2^16 degrade to a defined (modular) clustering instead of
    * producing garbage interleavings — callers with wider domains should
    * pre-bucket (e.g. `pmod` or range-rank) if mod-65536 locality is not
    * what they want. */
  def spreadBits16(v: Column): Column = {
    val a = v.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton Z-value of two 16-bit non-negative ints: bits of `x` at even
    * positions, bits of `y` at odd positions. */
  def zvalue(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Repartition so a subsequent write emits files of ≈ `targetBytes`
    * (default 128 MB, the canonical parquet/HDFS block sweet spot) —
    * the answer to the small-files problem: a 1000-executor job that
    * writes its final partitioning verbatim produces millions of tiny
    * files that throttle every later scan's file-listing and footer
    * reads. Sizing uses Catalyst's plan-level size estimate (derived
    * from source file sizes + selectivity — no extra job), so it is
    * safe to call on a 100 TB input.
    *
    * The estimate is UNCOMPRESSED in-memory bytes; parquet output is
    * typically several times smaller, so `compressionRatio` (default 3×,
    * a common snappy-parquet ratio for mixed columns) divides it before
    * sizing — tune it per table for tight file sizes. Join-multiplied
    * default stats can also explode the estimate, so the partition count
    * is capped at `maxPartitions` rather than trusting the plan blindly. */
  def repartitionForWrite(df: DataFrame,
      targetBytes: Long = 128L * 1024 * 1024,
      compressionRatio: Double = 3.0,
      maxPartitions: Int = 1 << 20): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val out = (BigDecimal(est) / compressionRatio).toBigInt
    val parts = ((out + targetBytes - 1) / targetBytes)
      .min(BigInt(maxPartitions)).max(BigInt(1)).toInt
    df.repartition(parts)
  }

  /** Global row numbering at scale — `row_number() OVER (ORDER BY …)`
    * without the single-partition window Spark plans for an empty
    * PARTITION BY (the classic cluster-killer: one task sorts the whole
    * table). Two-pass zipWithIndex design instead:
    *
    *   1. range-partition + sort-within-partitions on `sortCols`
    *      (parallel global sort), materialized once (`localCheckpoint`)
    *      so both passes see the identical layout;
    *   2. count rows per partition — |partitions| longs to the driver;
    *   3. one narrow mapPartitions adds `offset(pid) + local index`.
    *
    * Total cost: one range shuffle + a metadata-sized count job; every
    * stage is parallel. `sortCols` must be a unique key for the
    * numbering to be deterministic (same contract as row_number with a
    * tie-broken ORDER BY). Adds `rn` (1-based). */
  def globalRowNumber(df: DataFrame, sortCols: Seq[String],
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint()
    val counts = parted
      .groupBy(spark_partition_id().as("_pid"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L) { (acc, pid) =>
      acc + counts.getOrElse(pid, 0L)
    }.toArray
    val schema = parted.schema
      .add("rn", org.apache.spark.sql.types.LongType, nullable = false)
    // mapPartitionsWithIndex, NOT TaskContext.getPartitionId(): a
    // downstream coalesce() runs many parent partitions inside one task,
    // where the task-context id is the coalesced id (0) for every chunk
    // — the structural partition index is the only safe offset key.
    val rdd = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = offsets(pid)
      it.map { row =>
        i += 1
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Globally-ordered cumulative sums WITHOUT the single-partition
    * window: range-partition on the sort key, per-partition long totals
    * for each value column collected to the driver (n·|cols| numbers),
    * prefix offsets broadcast back, and one narrow pass accumulates the
    * running sums. Adds `rn` (1-based global row number) and
    * `<c>_cum` for every value column. Restricted to integral columns
    * on purpose: long addition is order-free, so the result is
    * bit-identical to the sequential window formulation at ANY
    * partition count — which is what lets the unbounded-input
    * sequential statistics (KS ECDFs, rank sums, SPRT prefix counts)
    * drop their `Window.orderBy(...)` single-partition barrier while
    * keeping their DuckDB twins unchanged. Float running sums must stay
    * out: two-phase addition reorders them.
    *
    * Null policy: a NULL value counts as 0 toward the running sum — the
    * same running total `sum(c) OVER (ORDER BY …)` produces, since SQL
    * sum skips NULLs. (Without the explicit coalesce, a NULL would NPE
    * the executor pass's `getLong`, and an all-NULL partition would NPE
    * the driver-side totals decode.) */
  def globalCumSum(df: DataFrame, sortCols: Seq[String],
      valueCols: Seq[String], partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val withLongs = valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, coalesce(col(c).cast("long"), lit(0L))))
    val parted = withLongs
      .repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint()
    val totals = parted
      .groupBy(spark_partition_id().as("_pid"))
      .agg(count(lit(1)).as("_n"),
        valueCols.map(c => sum(col(c)).as(c)): _*)
      .collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1) +: valueCols.indices.map(i => r.getLong(2 + i))).toArray)
      .toMap
    val zero = Array.fill(valueCols.size + 1)(0L)
    val offsets = (0 until n).scanLeft(zero) { (acc, pid) =>
      val t = totals.getOrElse(pid, zero)
      acc.zip(t).map { case (a, b) => a + b }
    }.toArray
    val schema = valueCols
      .foldLeft(parted.schema.add("rn",
        org.apache.spark.sql.types.LongType, nullable = false)) { (s, c) =>
        s.add(s"${c}_cum", org.apache.spark.sql.types.LongType, nullable = false)
      }
    val idx = valueCols.map(c => parted.schema.fieldIndex(c))
    val rdd = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = offsets(pid).clone()
      it.map { row =>
        run(0) += 1
        var i = 0
        while (i < idx.length) { run(i + 1) += row.getLong(idx(i)); i += 1 }
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++ run.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Rewrite `df` clustered by the Z-order of (`xCol`, `yCol`):
    * range-partition on the Z-value (balanced output files via range
    * sampling, no hash skew) and sort within partitions, so parquet
    * row-group min/max stats are tight on BOTH columns. Drop-in before a
    * `.write` — layout only, rows unchanged. */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
      partitions: Int): DataFrame = {
    val z = zvalue(col(xCol), col(yCol)).as("_z")
    df.withColumn("_z", z)
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
