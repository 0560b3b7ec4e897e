package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF (Kafka-Streams `Aggregator` analog): weighted mean.
  *
  * Buffer is (Σ value·weight, Σ weight) held as SCALED LONGS — the inputs
  * are exact 2-dp fixture values, so value·weight is an exact 4-dp number
  * and the integer accumulation is order-independent (raw double sums
  * drift by ULPs with partition order and can flip a rounded digit —
  * Det.scala's rule is that round() only be applied to engine-identical
  * values). `merge` keeps it a commutative monoid, so Spark runs it as
  * partial (map-side) + final aggregate — no extra shuffle versus a
  * built-in agg.
  *
  * DuckDB oracle twin: decimal sums, see q_agg_udaf in Aggregates.scala.
  */
object WeightedMean extends Aggregator[(Double, Double), (Long, Long), Double] {
  private val VwScale = 1e4 // value(2dp) × weight(2dp) → exact at 4dp
  private val WScale = 1e2

  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
    (b._1 + math.round(a._1 * a._2 * VwScale),
     b._2 + math.round(a._2 * WScale))
  override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0L) Double.NaN
    else (r._1.toDouble / VwScale) / (r._2.toDouble / WScale)
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: weighted mean of `value` weighted by `weight`. */
  def apply(value: Column, weight: Column): Column =
    udaf(WeightedMean).apply(value, weight)
}
