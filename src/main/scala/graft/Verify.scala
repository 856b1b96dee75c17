package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened after round 7 lost its correctness record to a wall-clock
  * blowout on a loaded driver machine (the serial dump of 125+ queries
  * exceeded the driver's patience; CORRECTNESS_r07.json came back `{}`):
  *   - oracle_sql.json is written FIRST, so a partial run still gives the
  *     driver everything it needs to grade whatever parquet landed;
  *   - queries run on a thread pool (SPARK_GRAFT_VERIFY_PAR, default 8).
  *     At sf0.01 per-query wall time is dominated by single-threaded
  *     driver-side analysis/planning, not executor cores, so concurrent
  *     jobs overlap almost perfectly — Spark's scheduler interleaves
  *     their tasks on the shared local cores;
  *   - a global deadline (SPARK_GRAFT_VERIFY_TIMEOUT_S, default 1500 s —
  *     r5's ~40 min serial run fit the driver's budget and r7's ~60+ min
  *     did not, so 25 min leaves slack even on a loaded machine) cancels
  *     whatever is still running, so a hung plan costs at most its own
  *     entry — every already-written parquet dir survives and gets
  *     graded;
  *   - progress + timing go to stderr for post-mortem.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Default to a healthy slice of the machine: the sf0.01 dump is
    // driver-overhead-bound per query, so local[16] + 8 concurrent
    // queries overlaps planning with execution instead of queueing 125
    // tiny jobs on 4 task slots.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors / 2).toString)
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // Dev-loop filter: SPARK_GRAFT_ONLY=q_a,q_b restricts the dump.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val work = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "8").toInt
    val timeoutS = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT_S", "1500").toLong
    val pool = Executors.newFixedThreadPool(par)
    val done = new AtomicInteger
    val t0 = System.nanoTime()
    work.foreach { case (name, fn) =>
      pool.submit(new Runnable { def run(): Unit = {
        val tq = System.nanoTime()
        // Job group per query: the watchdog (and nothing else) can
        // cancel this query's jobs without touching its siblings.
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          System.err.println(f"[verify] ${done.incrementAndGet()}%3d/${work.size} $name ok in ${(System.nanoTime() - tq) / 1e9}%.1fs (t+${(System.nanoTime() - t0) / 1e9}%.0fs)")
        } catch { case e: Throwable =>
          done.incrementAndGet()
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        } finally spark.sparkContext.clearJobGroup()
      }})
    }
    pool.shutdown()
    // Watchdog: if the pool is still running at the deadline, cancel
    // every remaining job group so awaitTermination can complete and the
    // finished queries' output survives.
    if (!pool.awaitTermination(timeoutS, TimeUnit.SECONDS)) {
      System.err.println(s"[verify] TIMEOUT after ${timeoutS}s with " +
        s"${work.size - done.get()} queries unfinished — cancelling")
      work.foreach { case (name, _) => spark.sparkContext.cancelJobGroup(name) }
      pool.awaitTermination(60, TimeUnit.SECONDS)
    }
    System.err.println(f"[verify] done ${done.get()}/${work.size} in ${(System.nanoTime() - t0) / 1e9}%.0fs")
    spark.stop()
  }
}
