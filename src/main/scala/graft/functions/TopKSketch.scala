package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoders

/** Misra-Gries heavy-hitters sketch as an `Aggregator` UDAF — the
  * "approx top-k over 100 TB" shape: fixed-size state per partition,
  * mergeable partials, one shuffle. Guarantees: every item with true
  * frequency > n/capacity survives, and reported counts undershoot true
  * counts by at most n/capacity (Misra & Gries 1982). With capacity ≥
  * number of distinct items no eviction ever happens and the result is
  * EXACT and deterministic — that regime is DuckDB-oracle-checkable
  * (q_approx_topk); the approximate regime is spec-checked against the
  * guarantee instead (sketch state depends on partition order, so counts
  * in the lossy regime are run-stable only per plan).
  */
case class TopKSketch(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < capacity => m.updated(x, 1L)
      case None =>
        // decrement-all: drop zeros (classic MG step, amortized O(1)/item)
        m.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest count, drop non-positive
      val counts = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)
      val cut = counts(capacity)
      combined.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder = Encoders.kryo[Map[String, Long]]
  override def outputEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
