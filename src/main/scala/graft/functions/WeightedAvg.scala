package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF: weighted average (sum(v*w)/sum(w)).
  *
  * Part of the declared UDF surface (SURVEY.md §2.3, "UDF surface" row):
  * the reference has no function library at all, so this demonstrates the
  * engine's user-extension path — a typed `Aggregator` registered via
  * `functions.udaf`, which Spark plans as a partial+final aggregate
  * (map-side combine, no shuffle of raw rows).
  */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
