package graft

import org.apache.spark.sql.functions._

/** Randomized-equivalence checks (fixed seeds — deterministic): the
  * operators here have a slow-but-obviously-correct reference
  * implementation, so equivalence on many random shapes pins the
  * distributed formulation against the naive one across edge cases an
  * example-based spec would never enumerate (ties on both axes, empty
  * partitions, frontier-of-one).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def naiveSkyline(pts: List[(Int, Double, Int)]): Set[Int] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.map(_._1).toSet

  test("skyline2D equals the naive dominance filter on random point sets") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val n = 5 + rnd.nextInt(56)
      // coarse grids force ties on both axes — the frontier edge cases
      val pts = List.tabulate(n)(i =>
        (i, (rnd.nextInt(20) + 1) * 1.5, rnd.nextInt(15)))
      val df = pts.toDF("id", "x", "y").repartition(3)
      val got = graft.ops.Skyline.skyline2D(df, "x", "y")
        .select("id").as[Int].collect().toSet
      assert(got == naiveSkyline(pts),
        s"seed=$seed points=$pts expected=${naiveSkyline(pts)} got=$got")
    }
  }

  test("hashSplit is monotone in trainFrac (train sets are nested)") {
    val ids = (1 to 400).toDF("id")
    def trainSet(f: Double): Set[Int] =
      graft.ops.Curation.hashSplit(ids, "id", trainFrac = f)
        .filter(col("split") === "train")
        .select("id").as[Int].collect().toSet
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val f1 = 0.05 + rnd.nextDouble() * 0.40
      val f2 = 0.50 + rnd.nextDouble() * 0.45
      val (lo, hi) = (trainSet(f1), trainSet(f2))
      assert(lo.subsetOf(hi),
        s"f1=$f1 f2=$f2: smaller fraction must be a subset " +
          s"(diff=${lo.diff(hi).take(5)})")
    }
  }

  test("intervalOverlapJoin equals the naive join on random interval sets") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(100 + seed)
      def intervals(n: Int, tag: String) = List.tabulate(n) { i =>
        val s = rnd.nextInt(200).toLong
        // mix of degenerate points, short and bucket-spanning intervals
        (rnd.nextInt(3).toLong + 1, s, s + rnd.nextInt(60), s"$tag$i")
      }
      val l = intervals(5 + rnd.nextInt(30), "L")
        .toDF("k", "ls", "le", "lid").repartition(3)
      val r = intervals(5 + rnd.nextInt(30), "R")
        .toDF("k", "rs", "re", "rid").repartition(2)
      val got = graft.ops.TemporalJoins.intervalOverlapJoin(
          l, "ls", "le", r, "rs", "re", key = "k",
          bucketWidth = 1 + rnd.nextInt(40), payload = Seq("rid"))
        .select("lid", "rid").collect()
        .map(x => (x.getString(0), x.getString(1))).toList
      val naive = l.join(r, l("k") === r("k") &&
          col("ls") <= col("re") && col("rs") <= col("le"))
        .select("lid", "rid").collect()
        .map(x => (x.getString(0), x.getString(1))).toList
      assert(got.sorted == naive.sorted,
        s"seed=$seed: bucketed must equal naive exactly once each " +
          s"(got=${got.size}, naive=${naive.size})")
    }
  }

  test("ddsketch build is partition-invariant and merge-associative") {
    val rnd = new scala.util.Random(7)
    val vals = List.fill(500)(("g", math.exp(rnd.nextGaussian() * 2)))
    val whole = graft.ops.Sketches.ddsketchBuild(
      vals.toDF("g", "v").repartition(7), "v", Seq("g"))
    // any 3-way split, merged in either association order, equals whole
    val (a, rest) = vals.splitAt(150)
    val (b, c) = rest.splitAt(150)
    def sk(x: List[(String, Double)]) =
      graft.ops.Sketches.ddsketchBuild(x.toDF("g", "v"), "v", Seq("g"))
    val m1 = graft.ops.Sketches.ddsketchMerge(
      graft.ops.Sketches.ddsketchMerge(sk(a), sk(b), Seq("g")), sk(c), Seq("g"))
    val m2 = graft.ops.Sketches.ddsketchMerge(
      sk(a), graft.ops.Sketches.ddsketchMerge(sk(b), sk(c), Seq("g")), Seq("g"))
    assert(whole.except(m1).isEmpty && m1.except(whole).isEmpty)
    assert(m1.except(m2).isEmpty && m2.except(m1).isEmpty)
  }
}
