package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF (Kafka-Streams `Aggregator` analog): weighted mean.
  *
  * Buffer is (Σ value·weight, Σ weight); `merge` makes it a proper
  * commutative monoid, so Spark runs it as a partial (map-side) +
  * final aggregate — no extra shuffle versus a built-in agg.
  *
  * NOTE on determinism: double addition is order-sensitive, so callers
  * on the DuckDB-oracle path should round the result (the drift is last-ulp;
  * the declared query q_agg_udaf rounds to 6 dp).
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
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

  /** Column form: weighted mean of `value` weighted by `weight`. */
  def apply(value: Column, weight: Column): Column =
    udaf(WeightedMean).apply(value, weight)
}
