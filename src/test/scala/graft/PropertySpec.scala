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
}
