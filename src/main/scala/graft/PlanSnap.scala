package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` of selected registry queries to one
  * file per query — the before/after plan evidence for optimization
  * rounds (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: sbt "runMain graft.PlanSnap <sfDir> <outDir> <suffix> [q1,q2,…]"
  * (no query list = the Bench headline set). Composite queries run
  * their eager index builds as part of plan construction, so this also
  * smoke-executes every build path at the chosen SF.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = if (args.length > 3) args(3).split(",").toSeq else Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            println(s"[plansnap] wrote $name")
          } catch { case e: Throwable =>
            System.err.println(s"[plansnap] $name FAILED: ${e.getMessage}")
          }
        case None => System.err.println(s"[plansnap] no such query: $name")
      }
    }
    spark.stop()
  }
}
