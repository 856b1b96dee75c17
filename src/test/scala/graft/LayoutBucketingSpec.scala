package graft

import org.apache.spark.sql.functions._

/** Pins the two write-side layout idioms that replace per-query work at
  * 100 TB: bucketed tables (join with zero Exchange, amortizing the
  * fact-table shuffle into a one-time layout write) and Z-order
  * clustering (tight parquet min/max footer stats on BOTH filter
  * columns, so scans prune on either dimension).
  */
class LayoutBucketingSpec extends SparkSpec {

  test("bucketedJoin: co-located join plans ZERO Exchange") {
    val o = Tables.orders(spark, sf).select("o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = graft.ops.Bucketing.bucketedJoin(
        spark, o, c, "o_custkey", 4, namePrefix = "graft_spec_bkt")
      joined.collect() // AQE: finalize
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(600))
      assert(!p.contains("Exchange"),
        "bucketed join must not shuffle either side:\n" + p.take(800))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketedJoin result == plain equi-join result") {
    val o = Tables.orders(spark, sf).select("o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val got = graft.ops.Bucketing.bucketedJoin(
        spark, o, c, "o_custkey", 4, namePrefix = "graft_spec_bkt2")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = o.join(c, "o_custkey")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("lshIndexProbe: matches lshTopK exactly; corpus side never exchanges") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    graft.ops.Similarity.lshIndexBuild(e, "vec_id", "embedding", dim = 64,
      tableName = "graft_spec_lsh_idx", tableBuckets = 4, bits = 6, tables = 4)
    val probed = graft.ops.Similarity.lshIndexProbe(spark,
      "graft_spec_lsh_idx", q, "vec_id", "embedding",
      dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
    val direct = graft.ops.Similarity.lshTopK(q, e, "vec_id", "embedding",
      dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
    assert(probed.exceptAll(direct).isEmpty && direct.exceptAll(probed).isEmpty,
      "persisted-index probe must return the identical result multiset")
    // the scale property: the index scan feeds the join with its bucketed
    // partitioning — only the query batch side exchanges
    probed.collect() // AQE: finalize
    // AQE renders "== Final Plan ==" and "== Initial Plan ==" in one
    // string — count shapes in the final section only
    val p = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("SortMergeJoin"), p.take(800))
    // the join key is `bucket`: the query batch side exchanges on it
    // once; a second bucket-keyed Exchange would mean the corpus
    // signatures are being re-shuffled on every probe (the exact cost
    // the index write amortizes away). Downstream q_id-keyed shuffles
    // (dedup + top-k window) are candidate-bounded and expected.
    val bucketExchanges = "Exchange hashpartitioning\\(bucket".r.findAllIn(p).length
    assert(bucketExchanges == 1,
      s"only the query side may shuffle on bucket (saw $bucketExchanges):\n" + p.take(900))
    assert(p.contains("Bucketed: true"),
      "corpus scan must read the bucketed layout:\n" + p.take(900))
  }

  test("lshIndexAppend: build half + append half ≡ one full build; still bucketed") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    graft.ops.Similarity.lshIndexBuild(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", dim = 64,
      tableName = "graft_spec_lsh_inc", tableBuckets = 4, bits = 6, tables = 4)
    graft.ops.Similarity.lshIndexAppend(e.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", dim = 64,
      tableName = "graft_spec_lsh_inc", tableBuckets = 4, bits = 6, tables = 4)
    val probed = graft.ops.Similarity.lshIndexProbe(spark,
      "graft_spec_lsh_inc", q, "vec_id", "embedding",
      dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
    val direct = graft.ops.Similarity.lshTopK(q, e, "vec_id", "embedding",
      dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
    assert(probed.exceptAll(direct).isEmpty && direct.exceptAll(probed).isEmpty,
      "incrementally-built index must equal the full-corpus result")
    probed.collect()
    val p = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("Bucketed: true"),
      "append must preserve the bucketed layout:\n" + p.take(900))
    assert("Exchange hashpartitioning\\(bucket".r.findAllIn(p).length == 1,
      "probe after append must still not shuffle the corpus:\n" + p.take(900))
  }

  test("dedup index: batchwise build+append+probe ≡ one-shot exactDedup; index never exchanges") {
    import graft.ops.Dedup
    val docs = Tables.documents(spark, sf)
    val batch = (b: Int) => docs.filter(col("doc_id") % 3 === b)
    Dedup.dedupIndexBuild(batch(0), "text", "doc_id",
      "graft_spec_dd_idx", tableBuckets = 4)
    val n1 = Dedup.dedupAgainstIndex(spark, "graft_spec_dd_idx",
      batch(1), "text", "doc_id").localCheckpoint()
    Dedup.dedupIndexAppend(spark, "graft_spec_dd_idx", n1, "text", "doc_id",
      tableBuckets = 4)
    // NOT checkpointed: the plan pin below must see the probe plan
    val n2 = Dedup.dedupAgainstIndex(spark, "graft_spec_dd_idx",
      batch(2), "text", "doc_id")
    // the incremental survivors of batches 0..2 = one-shot exactDedup,
    // EXCEPT ties across batches resolve to the earlier batch (not the
    // global min id) — compare fingerprint SETS, which ties don't move
    val survivors = spark.table("graft_spec_dd_idx").select("fp")
    val oneShot = Dedup.exactDedup(docs, "text", "doc_id")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    // index after both appends holds batch0+batch1 fps; batch2's novel
    // fps are n2's — union must equal the one-shot fingerprint set
    val incAll = survivors.union(
      n2.select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp")))
    assert(incAll.exceptAll(oneShot).isEmpty && oneShot.exceptAll(incAll).isEmpty,
      "incremental fp set must equal one-shot dedup's fp set")
    // scale pin: the probe anti-join consumes the bucketed index scan
    // directly — only the batch side may shuffle on the fingerprint
    n2.collect()
    val p = n2.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("Bucketed: true"),
      "index scan must read the bucketed layout:\n" + p.take(900))
    val idxExchanges = "Exchange hashpartitioning\\(fp".r.findAllIn(p).length
    assert(idxExchanges == 0, // batch side shuffles on `_fp`, never on `fp`
      s"index side must never exchange (saw $idxExchanges):\n" + p.take(900))
  }

  test("compactBucketed: collapses append files, preserves rows and probe results") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    def files(): Int = {
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        "graft_spec_lsh_cpt")
      dir.listFiles((_, n) => n.endsWith(".parquet")).length
    }
    graft.ops.Similarity.lshIndexBuild(e.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", dim = 64,
      tableName = "graft_spec_lsh_cpt", tableBuckets = 4, bits = 6, tables = 4)
    for (r <- 1 to 2)
      graft.ops.Similarity.lshIndexAppend(e.filter(col("vec_id") % 3 === r),
        "vec_id", "embedding", dim = 64,
        tableName = "graft_spec_lsh_cpt", tableBuckets = 4, bits = 6, tables = 4)
    val before = files()
    val rowsBefore = spark.table("graft_spec_lsh_cpt").count()
    val preProbe = graft.ops.Similarity.lshIndexProbe(spark,
      "graft_spec_lsh_cpt", q, "vec_id", "embedding",
      dim = 64, k = 5, bits = 6, tables = 4, probes = 2).collect().toSet
    val n = graft.ops.Bucketing.compactBucketed(
      spark, "graft_spec_lsh_cpt", "bucket", 4)
    assert(n == rowsBefore, s"compaction must rewrite every row: $n vs $rowsBefore")
    assert(files() < before,
      s"compaction must reduce file count (was $before, now ${files()})")
    assert(files() <= 4, s"at most one file per bucket after compaction: ${files()}")
    assert(spark.table("graft_spec_lsh_cpt").count() == rowsBefore)
    val postProbe = graft.ops.Similarity.lshIndexProbe(spark,
      "graft_spec_lsh_cpt", q, "vec_id", "embedding",
      dim = 64, k = 5, bits = 6, tables = 4, probes = 2).collect().toSet
    assert(postProbe == preProbe, "probe results must be unchanged by compaction")
  }

  test("ivfIndexProbe: matches ivfTopK exactly; inverted file read bucketed") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    graft.ops.Similarity.ivfIndexBuild(e, "vec_id", "embedding",
      tableName = "graft_spec_ivf_idx", tableBuckets = 4, nlist = 16)
    val probed = graft.ops.Similarity.ivfIndexProbe(spark,
      "graft_spec_ivf_idx", q, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6)
    val direct = graft.ops.Similarity.ivfTopK(q, e, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6)
    assert(probed.exceptAll(direct).isEmpty && direct.exceptAll(probed).isEmpty,
      "persisted inverted file must return the identical result multiset")
    probed.collect()
    val p = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(p).length
    assert(cellExchanges == 1,
      s"only the query side may shuffle on cell (saw $cellExchanges):\n" + p.take(900))
    assert(p.contains("Bucketed: true"),
      "inverted file must read the bucketed layout:\n" + p.take(900))
  }

  test("ivfPqProbe: corpus side reads bucketed with zero cell Exchange") {
    val e = Tables.embeddings(spark, sf)
    val cb = graft.ops.Similarity.pqTrain(e, "vec_id", "embedding",
      m = 4, k = 8, iters = 1)
    val coarse = graft.ops.Similarity.kmeansFit(e, "vec_id", "embedding",
      k = 4, iters = 1, cosine = false)
    graft.ops.Similarity.ivfPqIndexBuild(e, "vec_id", "embedding", cb, coarse,
      tableName = "graft_spec_ivfpq_idx", tableBuckets = 4)
    val probed = graft.ops.Similarity.ivfPqProbe(spark,
      "graft_spec_ivfpq_idx", e.filter(col("vec_id") < 5),
      "vec_id", "embedding", cb, coarse, k = 5, nprobe = 2)
    probed.collect()
    val p = probed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(p).length
    assert(cellExchanges == 1,
      s"only the query side may shuffle on cell (saw $cellExchanges):\n" + p.take(900))
    assert(p.contains("Bucketed: true"),
      "PQ-coded inverted file must read the bucketed layout:\n" + p.take(900))
  }

  test("zvalue: exact Morton codes for hand-interleaved inputs") {
    val df = spark.range(1).select(
      graft.ops.Layout.zvalue(lit(3), lit(5)).as("a"),      // 0b101 | 0b100010
      graft.ops.Layout.zvalue(lit(65535), lit(0)).as("b"),  // even bits set
      graft.ops.Layout.zvalue(lit(0), lit(65535)).as("c"),  // odd bits set
      graft.ops.Layout.zvalue(lit(0), lit(0)).as("d"))
    val r = df.collect()(0)
    assert(r.getLong(0) === 39L)
    assert(r.getLong(1) === 0x55555555L)
    assert(r.getLong(2) === 0xAAAAAAAAL)
    assert(r.getLong(3) === 0L)
  }

  test("zvalue: matches a bit-by-bit reference on the full 8-bit grid + 16-bit edges") {
    import spark.implicits._
    def ref(x: Int, y: Int): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1).toLong << (2 * i)) |
        (((y >> i) & 1).toLong << (2 * i + 1))).reduce(_ | _)
    val grid = (for { x <- 0 until 256; y <- 0 until 256 } yield (x, y)) ++
      Seq((65535, 65535), (65535, 1), (1, 65535), (32768, 32767))
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.ops.Layout.zvalue(col("x"), col("y")).as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ref(x, y), s"zvalue($x,$y)=$z, want ${ref(x, y)}")
    }
    // bijective on the grid: distinct inputs → distinct codes
    assert(got.map(_._3).distinct.length == grid.length)
  }

  test("zvalue: inputs ≥ 2^16 degrade to defined mod-65536 clustering") {
    // keys wider than 16 bits (p_partkey at big SFs) must produce the
    // same code as their masked low 16 bits — a defined degradation —
    // not a corrupt interleaving from unmasked high bits
    val df = spark.range(1).select(
      graft.ops.Layout.zvalue(lit(65536L + 3), lit(131072L + 5)).as("a"),
      graft.ops.Layout.zvalue(lit(3), lit(5)).as("b"),
      graft.ops.Layout.zvalue(lit(-1L), lit(0)).as("c"),
      graft.ops.Layout.zvalue(lit(65535), lit(0)).as("d"))
    val r = df.collect()(0)
    assert(r.getLong(0) === r.getLong(1), "high bits must be masked off")
    assert(r.getLong(2) === r.getLong(3), "-1 masks to 0xFFFF")
  }

  test("zorderBy: rows unchanged, partitions cover disjoint z-ranges") {
    val df = Tables.part(spark, sf).select("p_partkey", "p_size")
    val clustered = graft.ops.Layout.zorderBy(df, "p_size", "p_partkey", 4)
    assert(clustered.count() === df.count())
    // each output partition must own a contiguous, non-overlapping slice
    // of the z-space (that is what makes footer stats selective)
    val ranges = clustered
      .withColumn("z", graft.ops.Layout.zvalue(col("p_size"),
        pmod(col("p_partkey"), lit(65536))))
      .groupBy(spark_partition_id().as("pid"))
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping z-ranges: $ranges")
      case _ =>
    }
  }

  test("hive-partitioned write: day filter prunes at the PartitionFilters level") {
    // the time-partitioned table layout every event archive uses: a
    // day-equality predicate must never touch the other days' files
    val dir = tmpDir("graft-partprune")
    val ev = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    val day = ev.select(max("day")).collect()(0).getDate(0)
    val q = spark.read.parquet(dir).filter(col("day") === lit(day))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      "day predicate must be a partition filter, not a data filter:\n" +
        plan.take(500))
    assert(q.count() == ev.filter(col("day") === lit(day)).count())
  }

  test("dynamic partition pruning: dim filter reaches the fact scan at runtime") {
    // DPP: joining a day-partitioned fact to a filtered dim must prune
    // fact partitions from the DIM's filter result, not scan-all-days
    val dir = tmpDir("graft-dpp")
    val ev = Tables.events(spark, sf).withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    val fact = spark.read.parquet(dir)
    // DPP fires only when the build side has a SELECTIVE predicate
    // (a bare limit/distinct doesn't qualify as one)
    val dim = ev.select(col("day")).distinct()
      .filter(dayofmonth(col("day")) <= 3)
    val joined = fact.join(dim, Seq("day"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "expected a dynamicpruning subquery on the fact scan:\n" +
        plan.take(800))
  }

  test("globalRowNumber matches the window row_number, even under coalesce") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf).select("event_id", "value")
    val expect = ev.withColumn("rn",
        row_number().over(Window.orderBy("value", "event_id")).cast("long"))
      .select("event_id", "rn")
    val got = graft.ops.Layout
      .globalRowNumber(ev, Seq("value", "event_id"), partitions = 7)
      .select("event_id", "rn")
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
    // regression: a downstream coalesce(1) once collapsed every
    // partition's offset to zero (TaskContext pid vs structural pid)
    val c1 = got.coalesce(1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = expect.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c1 == exp, "coalesced read must keep global offsets")
  }

  test("globalCumSum matches the window cumsum bit-for-bit at any partition count") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
      .select(col("event_id"),  col("value"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("a"),
        lit(1L).as("one"))
    val w = Window.orderBy("value", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = ev
      .withColumn("rn", row_number().over(Window.orderBy("value", "event_id")).cast("long"))
      .withColumn("a_cum", sum("a").over(w))
      .withColumn("one_cum", sum("one").over(w))
      .select("event_id", "rn", "a_cum", "one_cum")
    for (parts <- Seq(1, 7)) {
      val got = graft.ops.Layout.globalCumSum(
          ev, Seq("value", "event_id"), Seq("a", "one"), partitions = parts)
        .select("event_id", "rn", "a_cum", "one_cum")
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        s"partitions=$parts: distributed cumsum must equal the window form")
    }
  }

  test("globalCumSum null policy: NULL counts as 0, all-NULL partitions survive") {
    import spark.implicits._
    def L(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    val nl: java.lang.Long = null
    // sort key 1..6; nulls interleaved AND clustered so at least one
    // range partition (partitions=3 over 6 rows) is entirely NULL —
    // the case that NPE'd the driver-side totals decode before the fix
    val df = Seq((1L, L(10L)), (2L, nl), (3L, nl), (4L, nl), (5L, L(5L)), (6L, nl))
      .toDF("k", "v")
    val got = graft.ops.Layout.globalCumSum(df, Seq("k"), Seq("v"), partitions = 3)
      .select("k", "rn", "v_cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 10L), (2L, 2L, 10L), (3L, 3L, 10L),
      (4L, 4L, 10L), (5L, 5L, 15L), (6L, 6L, 15L)),
      s"NULL must contribute 0 to the running sum (sum-over-window semantics): $got")
  }

  test("fingerprint index tombstones: probe(build∪append−delete) ≡ probe(build(A∪B−D)); compact folds") {
    // r14 verdict item 2: the persisted-index family gains retraction.
    import graft.ops.Dedup
    import spark.implicits._
    val fpOf = graft.functions.TextFunctions.fingerprint(col("text"))
    val base = Tables.documents(spark, sf)
      .select("doc_id", "text").filter(col("doc_id") < 200).cache()
    val a = base.filter(col("doc_id") < 100)
    val b = base.filter(col("doc_id") >= 100)
    val tbl = "graft_spec_dd_tomb"
    Dedup.dedupIndexBuild(a, "text", "doc_id", tbl, tableBuckets = 4)
    val n1 = Dedup.dedupAgainstIndex(spark, tbl, b, "text", "doc_id")
      .localCheckpoint()
    Dedup.dedupIndexAppend(spark, tbl, n1, "text", "doc_id", tableBuckets = 4)
    // retract every tenth A-doc, then probe EXACT COPIES of A (shifted
    // ids): without the delete, every copy is an index hit and drops;
    // with it, exactly the retracted texts re-enter — deletion is
    // load-bearing for the assertion, not incidental
    val retracted = a.filter(col("doc_id") % 10 === 0)
    Dedup.dedupIndexDelete(spark, tbl, retracted, "text")
    val probeBatch = a.select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val probed = Dedup.dedupAgainstIndex(spark, tbl, probeBatch, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    // scratch twin: build over (A∪B) minus every doc holding a deleted fp
    val delFps = retracted.select(fpOf.as("dfp")).distinct()
    val tbl2 = "graft_spec_dd_tomb2"
    Dedup.dedupIndexBuild(
      base.join(delFps, fpOf === col("dfp"), "left_anti"),
      "text", "doc_id", tbl2, tableBuckets = 4)
    val want = Dedup.dedupAgainstIndex(spark, tbl2, probeBatch, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(probed == want,
      s"delete must equal a rebuild without the deleted docs: " +
        s"extra=${(probed -- want).take(5)} missing=${(want -- probed).take(5)}")
    assert(probed.nonEmpty, "retracted fingerprints must re-enter as novel")
    // the live (fp, first_id) sets agree too
    val liveSet = Dedup.liveFingerprintIndex(spark, tbl)
      .select("fp", "first_id").as[(String, Long)].collect().toSet
    val wantSet = spark.table(tbl2)
      .select("fp", "first_id").as[(String, Long)].collect().toSet
    assert(liveSet == wantSet, "live view must equal the scratch rebuild")
    // compact folds the tombstones into the base and TRUNCATES the side
    // table (truncate, not drop — streams plan the anti-join against it)
    Dedup.fingerprintIndexCompact(spark, tbl, tableBuckets = 4)
    assert(spark.table(tbl + "_del").isEmpty,
      "compact must truncate the tombstone table")
    val afterCompact = Dedup.dedupAgainstIndex(spark, tbl, probeBatch,
      "text", "doc_id").select("doc_id").as[Long].collect().toSet
    assert(afterCompact == probed, "compaction must not change probe results")
    val baseSet = spark.table(tbl)
      .select("fp", "first_id").as[(String, Long)].collect().toSet
    assert(baseSet == wantSet, "compacted base must equal the scratch rebuild")
    // delete → re-insert → suppress again: the APPEND's rows carry the
    // index's current generation, so they outlive the delete; without
    // that, the re-inserted row stays suppressed and every later
    // duplicate keeps passing the gate (r15 review)
    val doc10 = base.filter(col("doc_id") === 10)
    Dedup.dedupIndexDelete(spark, tbl, doc10, "text")
    val reinsert = doc10.select((col("doc_id") + 5000).as("doc_id"), col("text"))
    val novel2 = Dedup.dedupAgainstIndex(spark, tbl, reinsert, "text", "doc_id")
      .localCheckpoint()
    assert(novel2.count() == 1, "retracted fingerprint must re-enter as novel")
    Dedup.dedupIndexAppend(spark, tbl, novel2, "text", "doc_id", tableBuckets = 4)
    val third = doc10.select((col("doc_id") + 6000).as("doc_id"), col("text"))
    assert(Dedup.dedupAgainstIndex(spark, tbl, third, "text", "doc_id").isEmpty,
      "a re-inserted fingerprint must suppress later duplicates " +
        "(the appended row's generation outlives the delete)")
    // r15 ADVICE: the re-insert must NOT resurrect the STALE pre-delete
    // row — the live view holds exactly ONE row for the fp, carrying the
    // re-inserted canonical id (a latest-op-wins key log would hold two
    // rows with conflicting first_ids here)
    val fp10 = doc10
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .as[String].head()
    val liveRows10 = Dedup.liveFingerprintIndex(spark, tbl)
      .filter(col("fp") === fp10)
      .select("first_id").as[Long].collect().toSeq
    assert(liveRows10 == Seq(5010L),
      s"delete → re-insert must leave exactly the fresh row live " +
        s"(stale pre-delete row suppressed): got $liveRows10")
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    spark.sql(s"DROP TABLE IF EXISTS `$tbl2`")
  }

  test("lsh index tombstones: probe(build−delete) ≡ lshTopK over the corpus without deleted ids; compact folds") {
    import graft.ops.Similarity
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val tbl = "graft_spec_lsh_tomb"
    Similarity.lshIndexBuild(e, "vec_id", "embedding", dim = 64,
      tableName = tbl, tableBuckets = 4, bits = 6, tables = 4)
    Similarity.lshIndexDelete(
      e.filter(col("vec_id") % 7 === 0).select("vec_id"), "vec_id", tbl)
    def probe() = Similarity.lshIndexProbe(spark, tbl, q, "vec_id",
      "embedding", dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
    // materialized: `probed` is compared again AFTER the compact below
    // rewrites the base table and drops _del — the lazy plan would read
    // deleted files
    val probed = probe().localCheckpoint()
    val direct = Similarity.lshTopK(q, e.filter(col("vec_id") % 7 =!= 0),
      "vec_id", "embedding", dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
    assert(probed.exceptAll(direct).isEmpty && direct.exceptAll(probed).isEmpty,
      "tombstoned probe must equal the direct result over the live corpus")
    // deletion is load-bearing: the full-corpus result differs
    val full = Similarity.lshTopK(q, e, "vec_id", "embedding",
      dim = 64, k = 5, bits = 6, tables = 4, probes = 2)
    assert(full.exceptAll(probed).count() > 0,
      "fixture must delete vectors that appeared in some top-k")
    // compact folds; the bucketed zero-corpus-Exchange probe shape holds
    Similarity.lshIndexCompact(spark, tbl, tableBuckets = 4)
    assert(spark.table(tbl + "_del").isEmpty,
      "compact must truncate the tombstone table")
    // delete → re-append revives the vector id WITHOUT touching the
    // tombstone table's files (the append's rows carry a generation
    // past the delete — pure appends are the whole point: safe under a
    // live streaming probe, r15 ADVICE)
    Similarity.lshIndexDelete(
      e.filter(col("vec_id") === 1).select("vec_id"), "vec_id", tbl)
    Similarity.lshIndexAppend(e.filter(col("vec_id") === 1),
      "vec_id", "embedding", dim = 64, tableName = tbl, tableBuckets = 4,
      bits = 6, tables = 4)
    assert(!spark.table(tbl + "_del").isEmpty,
      "re-append must NOT rewrite the tombstone table (append-only contract)")
    assert(Similarity.liveLshIndex(spark, tbl)
        .filter(col("n_id") === 1).count() > 0,
      "a re-appended id must be live again")
    val after = probe()
    assert(after.exceptAll(probed).isEmpty && probed.exceptAll(after).isEmpty,
      "compaction must not change probe results")
    after.collect()
    val p = after.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("Bucketed: true"),
      "compacted index must keep the bucketed layout:\n" + p.take(900))
    assert("Exchange hashpartitioning\\(bucket".r.findAllIn(p).length == 1,
      "probe after compact must still not shuffle the corpus:\n" + p.take(900))
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
  }

  test("ivf index tombstones: probe(build−delete) ≡ ivfTopK over the live corpus; compact folds") {
    // r16: the raw inverted file joins the retraction lifecycle — the
    // last vector index without it (LSH r15, IVFADC r16).
    import graft.ops.Similarity
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val tbl = "graft_spec_ivf_tomb"
    try {
      Similarity.ivfIndexBuild(e, "vec_id", "embedding",
        tableName = tbl, tableBuckets = 4, nlist = 16)
      Similarity.ivfIndexDelete(
        e.filter(col("vec_id") % 7 === 0).select("vec_id"), "vec_id", tbl)
      def probe() = Similarity.ivfIndexProbe(spark, tbl, q,
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6)
      val probed = probe().localCheckpoint()
      val direct = Similarity.ivfTopK(q, e.filter(col("vec_id") % 7 =!= 0),
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6)
      assert(probed.exceptAll(direct).isEmpty && direct.exceptAll(probed).isEmpty,
        "tombstoned probe must equal the direct result over the live corpus")
      val full = Similarity.ivfTopK(q, e, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6)
      assert(full.exceptAll(probed).count() > 0,
        "fixture must delete vectors that appeared in some top-k")
      Similarity.ivfIndexCompact(spark, tbl, tableBuckets = 4)
      assert(spark.table(tbl + "_del").isEmpty,
        "compact must truncate the tombstone table")
      val after = probe()
      assert(after.exceptAll(probed).isEmpty && probed.exceptAll(after).isEmpty,
        "compaction must not change probe results")
      // the zero-corpus-Exchange probe shape survives the lifecycle
      after.collect()
      val p = after.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("Bucketed: true"),
        "compacted inverted file must keep the bucketed layout:\n" + p.take(900))
      assert("Exchange hashpartitioning\\(cell".r.findAllIn(p).length == 1,
        "only the query side may shuffle on cell:\n" + p.take(900))
    } finally
      Seq(tbl, tbl + "_del").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("liveView reports the tombstoned-key count and the compact advisory as observed metrics") {
    // r16 (r15 verdict item: tombstone-size observability): nothing
    // bounds the broadcast `_del` side "small by contract" — so every
    // live-view probe against a non-empty delete set must REPORT its
    // tombstoned-key count (the maxBucket-drop pattern), making an
    // uncompacted delete set visible long before its broadcast hurts.
    // r17 (r16 verdict item 3): the raw gauge gains a documented
    // threshold — compact_advised flips when the tombstoned-key count
    // reaches spark.graft.tombstone.compactThreshold, so operators get
    // an explicit "compact me" instead of interpreting a number.
    import graft.ops.{Bucketing, Dedup}
    import spark.implicits._
    val docs = spark.range(20).select(col("id").as("doc_id"),
      concat(lit("tomb metric fixture text "), col("id")).as("text"))
    val tbl = "graft_spec_tomb_metric"
    Dedup.dedupIndexBuild(docs, "text", "doc_id", tbl, tableBuckets = 4)
    // two delete calls, one overlapping key: 3 DISTINCT tombstoned keys
    Dedup.dedupIndexDelete(spark, tbl,
      docs.filter(col("doc_id").isin(2L, 3L)), "text")
    Dedup.dedupIndexDelete(spark, tbl,
      docs.filter(col("doc_id").isin(3L, 4L)), "text")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Boolean)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith(Bucketing.TombstoneMetricPrefix))
            seen.add((row.getAs[Long]("n_tombstoned_keys"),
              row.getAs[Boolean]("compact_advised")))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val probe = docs.select((col("doc_id") + 100).as("doc_id"), col("text"))
      Dedup.dedupAgainstIndex(spark, tbl, probe, "text", "doc_id").collect()
      // deterministic: wait for the async listener bus, no sleeps
      org.apache.spark.graftbus.ListenerDrain.drain(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toSeq == Seq((3L, false)),
        s"probe must observe 3 tombstoned keys, under the default " +
          s"threshold, exactly once: ${seen}")
      // threshold is plan-time session conf: at ≤ 3 the SAME probe advises
      seen.clear()
      spark.conf.set(Bucketing.CompactThresholdConf, "3")
      Dedup.dedupAgainstIndex(spark, tbl, probe, "text", "doc_id").collect()
      org.apache.spark.graftbus.ListenerDrain.drain(spark.sparkContext)
      assert(seen.asScala.toSeq == Seq((3L, true)),
        s"at threshold 3 the probe must advise compaction: ${seen}")
    } finally {
      spark.conf.unset(Bucketing.CompactThresholdConf)
      spark.listenerManager.unregister(listener)
      Seq(tbl, tbl + "_del").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  test("single-maintainer contract: generation stamping is read-then-append — concurrent maintainers are outside the contract") {
    // r17 (r16 verdict item 2): [[Bucketing.currentGen]] deliberately
    // has no coordination. This pin makes the assumption INSPECTABLE
    // rather than implicit: two maintainers that each read the
    // generation before either appends would stamp the SAME delete
    // sequence (their deletes become indistinguishable, and an append
    // racing them gets an ordering neither chose) — which is why every
    // mutating lifecycle op requires ONE maintainer per index at a
    // time (scaladoc atop Bucketing's lifecycle section). The same
    // maintainer RETRYING a failed op is inside the contract
    // (TfIdfSpec's searchIndexDelete retry case).
    import graft.ops.{Bucketing, Dedup}
    import spark.implicits._
    val docs = spark.range(12).select(col("id").as("doc_id"),
      concat(lit("maintainer contract fixture "), col("id")).as("text"))
    val tbl = "graft_spec_maintainer"
    try {
      Dedup.dedupIndexBuild(docs, "text", "doc_id", tbl, tableBuckets = 4)
      // what two concurrent maintainers would do: both read gen first
      val seqA = Bucketing.currentGen(spark, tbl) + 1L
      val seqB = Bucketing.currentGen(spark, tbl) + 1L
      assert(seqA == seqB,
        "read-then-append: concurrent maintainers WOULD stamp the same " +
          "sequence — the documented reason the contract is single-maintainer")
      // the contract in use: one maintainer, sequential ops → strictly
      // increasing sequences, one per delete
      Dedup.dedupIndexDelete(spark, tbl,
        docs.filter(col("doc_id") === 1L), "text")
      val g1 = Bucketing.currentGen(spark, tbl)
      Dedup.dedupIndexDelete(spark, tbl,
        docs.filter(col("doc_id") === 2L), "text")
      val g2 = Bucketing.currentGen(spark, tbl)
      assert(g1 == seqA && g2 == g1 + 1L,
        s"sequential maintenance must stamp strictly increasing seqs: $g1, $g2")
    } finally
      Seq(tbl, tbl + "_del").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("RefreshEnvelope: persisted per-table write counter counts every lifecycle op; guard trips on the second write") {
    // r17 (r16 verdict item 1, batch half — the live-stream trip is in
    // StreamingSpec): every Bucketing write path bumps a persisted
    // counter file, capture() snapshots it, and staleTables/assertFresh
    // flag a table written MORE THAN ONCE since capture (the first
    // write is inside the measured envelope — visible to a running
    // stream — so it must NOT trip).
    import graft.ops.{Bucketing, Dedup, RefreshEnvelope}
    import spark.implicits._
    val docs = spark.range(16).select(col("id").as("doc_id"),
      concat(lit("envelope counter fixture "), col("id")).as("text"))
    val tbl = "graft_spec_envelope_ctr"
    try {
      val before = RefreshEnvelope.writeCount(spark, tbl)
      Dedup.dedupIndexBuild(docs, "text", "doc_id", tbl, tableBuckets = 4)
      assert(RefreshEnvelope.writeCount(spark, tbl) == before + 1,
        "build must record one write on the base table")
      assert(RefreshEnvelope.tablesOf(spark, tbl).toSet ==
        Set(tbl, tbl + "_del"), "family discovery: base + tombstones")
      val guard = RefreshEnvelope.captureIndex(spark, tbl)
      assert(guard.staleTables.isEmpty && !guard.breached)
      // write #1 per table: inside the envelope — must not trip
      Dedup.dedupIndexDelete(spark, tbl,
        docs.filter(col("doc_id") === 3L), "text")
      assert(guard.staleTables.isEmpty,
        "the FIRST post-capture write is visible to a running stream " +
          "and must not trip the guard")
      guard.assertFresh()
      // write #2 on _del: past the envelope — trips
      Dedup.dedupIndexDelete(spark, tbl,
        docs.filter(col("doc_id") === 4L), "text")
      assert(guard.staleTables == Seq(tbl + "_del"),
        s"the SECOND write must trip: ${guard.staleTables}")
      val ex = intercept[IllegalStateException](guard.assertFresh())
      assert(ex.getMessage.contains("refresh envelope") &&
        ex.getMessage.contains(tbl + "_del") &&
        ex.getMessage.contains("Restart"),
        s"fail-fast message must name the stale table and the remedy: ${ex.getMessage}")
      assert(guard.breached, "breach flag must latch")
    } finally
      Seq(tbl, tbl + "_del").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("RefreshEnvelope: counters are per-index-family — maintenance on one index never trips another's guard; the BM25 family counts every side table") {
    // The guard must be a per-stream-per-family signal, not a global
    // "something was written somewhere" alarm: a pipeline running ten
    // streams over ten indexes compacts one of them and must restart
    // ONE stream. And the family coverage must include the side tables
    // a probe plans in: searchIndexAppend touches base + _docs +
    // _stats; searchIndexDelete touches _del + _stats (the postings are
    // suppressed via _del, not rewritten).
    import graft.ops.{Dedup, RefreshEnvelope, TfIdf}
    import spark.implicits._
    val docs = spark.range(24).select(col("id").as("doc_id"),
      concat(lit("family isolation fixture text "), col("id")).as("text"))
    val a = "graft_spec_env_fam_a" // BM25 posting index
    val b = "graft_spec_env_fam_b" // fingerprint index
    try {
      TfIdf.searchIndexBuild(docs, "doc_id", "text", a, tableBuckets = 4)
      Dedup.dedupIndexBuild(docs, "text", "doc_id", b, tableBuckets = 4)
      assert(RefreshEnvelope.tablesOf(spark, a).toSet ==
        Set(a, a + "_del", a + "_docs", a + "_stats"),
        "BM25 family discovery must include every side table")
      val guardA = RefreshEnvelope.captureIndex(spark, a)
      val guardB = RefreshEnvelope.captureIndex(spark, b)
      val before = Seq(a, a + "_docs", a + "_stats", a + "_del")
        .map(t => RefreshEnvelope.writeCount(spark, t))
      // two deletes on B: B's guard trips, A's must stay quiet
      Dedup.dedupIndexDelete(spark, b, docs.filter(col("doc_id") === 1L), "text")
      Dedup.dedupIndexDelete(spark, b, docs.filter(col("doc_id") === 2L), "text")
      assert(guardB.staleTables == Seq(b + "_del"))
      assert(guardA.staleTables.isEmpty,
        "maintenance on another index must not trip this guard")
      guardA.assertFresh()
      // one append on A: base + _docs + _stats each gain exactly one
      // write; _del untouched
      TfIdf.searchIndexAppend(
        docs.select(col("doc_id") + 1000L as "doc_id", col("text")),
        "doc_id", "text", a, tableBuckets = 4)
      val after = Seq(a, a + "_docs", a + "_stats", a + "_del")
        .map(t => RefreshEnvelope.writeCount(spark, t))
      assert(after.zip(before).map { case (x, y) => x - y } ==
        Seq(1L, 1L, 1L, 0L),
        s"append must count base/_docs/_stats once each: $before -> $after")
      // one delete on A: _del and _stats gain one write each — still
      // inside the envelope (first write per table since capture...
      // except _stats, which the append above already wrote once)
      TfIdf.searchIndexDelete(spark, a,
        docs.filter(col("doc_id") === 3L).select("doc_id"), "doc_id")
      assert(guardA.staleTables == Seq(a + "_stats"),
        "append + delete both wrote _stats: the SECOND write trips on " +
          s"exactly that table: ${guardA.staleTables}")
    } finally
      Seq(a, a + "_del", a + "_docs", a + "_stats", b, b + "_del")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  test("CompactThresholdConf: a malformed value fails naming the conf key, not as a bare NumberFormatException") {
    // r17 ADVICE: compactThreshold did an unvalidated .toLong, so a
    // typo'd conf surfaced as a bare NumberFormatException from inside
    // every liveView plan construction with nothing naming the key.
    import graft.ops.{Bucketing, Dedup}
    val docs = spark.range(10).select(col("id").as("doc_id"),
      concat(lit("threshold conf fixture "), col("id")).as("text"))
    val tbl = "graft_spec_thresh_conf"
    try {
      Dedup.dedupIndexBuild(docs, "text", "doc_id", tbl, tableBuckets = 4)
      Dedup.dedupIndexDelete(spark, tbl,
        docs.filter(col("doc_id") === 1L), "text")
      spark.conf.set(Bucketing.CompactThresholdConf, "1e6") // plausible typo
      val ex = intercept[IllegalArgumentException](
        Bucketing.liveView(spark, tbl, "fp"))
      assert(ex.getMessage.contains(Bucketing.CompactThresholdConf) &&
        ex.getMessage.contains("1e6"),
        s"the error must name the conf key and the bad value: ${ex.getMessage}")
    } finally {
      spark.conf.unset(Bucketing.CompactThresholdConf)
      Seq(tbl, tbl + "_del").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  test("maintainIfAdvised: below threshold → None; advised → compacts, gauge drops to zero, probe unchanged; refuses exactly the streams over THIS index") {
    // r18 (r17 verdict item 4): advise→act. The compact_advised
    // observed metric told an operator to compact; this helper closes
    // the loop — same threshold predicate, the restart fence ENFORCED
    // and PRECISE: compact is the one lifecycle op that rewrites
    // files, so a live stream with this index family in its analyzed
    // plan is refused loudly, while an unrelated stream (the normal
    // many-streams-many-indexes topology) does not block.
    import graft.ops.{Bucketing, Dedup, RefreshEnvelope}
    import graft.streaming.StreamingOps
    import spark.implicits._
    val docs = spark.range(20).select(col("id").as("doc_id"),
      concat(lit("maintain advised fixture "), col("id")).as("text"))
    val tbl = "graft_spec_maintain_adv"
    try {
      Dedup.dedupIndexBuild(docs, "text", "doc_id", tbl, tableBuckets = 4)
      Dedup.dedupIndexDelete(spark, tbl,
        docs.filter(col("doc_id").isin(2L, 3L)), "text")
      Dedup.dedupIndexDelete(spark, tbl,
        docs.filter(col("doc_id").isin(3L, 4L)), "text") // 3 distinct keys
      val probe = docs.select((col("doc_id") + 100L).as("doc_id"), col("text"))
      val before = Dedup.dedupAgainstIndex(spark, tbl, probe, "text", "doc_id")
        .collect().map(_.toString).sorted.toSeq
      // 3 tombstoned keys < the 1M default: not advised, nothing runs
      assert(Bucketing.maintainIfAdvised(spark, tbl, "fp", "fp", 4).isEmpty)
      assert(Bucketing.currentGen(spark, tbl) > 0L,
        "not-advised must leave the delete set untouched")
      spark.conf.set(Bucketing.CompactThresholdConf, "3")
      // advised + a live probe OVER THIS INDEX: refuse, naming it
      val ms = new org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, java.sql.Timestamp)](91, spark, None)
      val q = StreamingOps.dedupIngestStream(
        ms.toDF().toDF("doc_id", "text", "ts"), "text", "doc_id", "ts",
        "10 minutes", spark, tbl)
        .writeStream.format("noop").queryName("maintain_adv_probe").start()
      try {
        val ex = intercept[IllegalStateException](
          Bucketing.maintainIfAdvised(spark, tbl, "fp", "fp", 4))
        assert(ex.getMessage.contains(tbl) &&
          ex.getMessage.contains("maintain_adv_probe"), ex.getMessage)
      } finally { q.stop(); q.awaitTermination() }
      // an UNRELATED live stream must not block: the helper compacts —
      // tombstones fold, the gauge's source empties, probe results
      // unchanged by construction
      val unrelated = spark.readStream.format("rate").load()
        .writeStream.format("noop").start()
      val n =
        try Bucketing.maintainIfAdvised(spark, tbl, "fp", "fp", 4)
        finally { unrelated.stop(); unrelated.awaitTermination() }
      assert(n.nonEmpty && n.get > 0L, s"advised compact must run: $n")
      assert(spark.table(tbl + "_del").isEmpty,
        "compact must truncate the delete set (the gauge reads zero)")
      val after = Dedup.dedupAgainstIndex(spark, tbl, probe, "text", "doc_id")
        .collect().map(_.toString).sorted.toSeq
      assert(after == before, "probe results must be unchanged by compact")
      // idempotent from here: the advisory is gone
      assert(Bucketing.maintainIfAdvised(spark, tbl, "fp", "fp", 4).isEmpty)
    } finally {
      spark.conf.unset(Bucketing.CompactThresholdConf)
      RefreshEnvelope.guardOf(spark, tbl).foreach(_.detach())
      Seq(tbl, tbl + "_del").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  test("RefreshEnvelope counters honor the conf-selectable directory — the object-store escape hatch") {
    // r18 (r17 verdict item 3): the counter scheme requires an
    // atomic-rename filesystem; on an object-store warehouse the
    // counters route to a rename-atomic store via CounterDirConf while
    // the data stays put. Pin: the conf moves the counter file, and
    // reads follow the same conf.
    import graft.ops.RefreshEnvelope
    val dir = java.nio.file.Files.createTempDirectory("graft_env_ctr")
      .toString
    val t = "graft_spec_ctr_dir_tbl"
    // a SEPARATE session: the conf is per-session runtime conf (this
    // also pins that), and mutating the shared suite session's conf
    // would race concurrently-running suites' lifecycle writes into
    // the temp dir for the duration of the test
    val s2 = spark.newSession()
    s2.conf.set(RefreshEnvelope.CounterDirConf, dir)
    assert(RefreshEnvelope.writeCount(s2, t) == 0L)
    RefreshEnvelope.recordWrite(s2, t)
    RefreshEnvelope.recordWrite(s2, t)
    assert(RefreshEnvelope.writeCount(s2, t) == 2L)
    assert(new java.io.File(dir, t + ".__writes").isFile,
      s"counter must land under $dir")
    // the suite session never saw the conf: reads stay on the
    // warehouse dir, where nothing landed
    assert(RefreshEnvelope.writeCount(spark, t) == 0L,
      "no counter may leak into the warehouse dir")
  }
}
