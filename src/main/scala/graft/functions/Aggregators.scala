package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (`Aggregator[IN, BUF, OUT]`) — the UDAF
  * surface the reference lacks entirely (its TODO wanted a perl-eval
  * module, /root/reference/TODO:31-34; Spark's typed Aggregator is the
  * principled version: merge-able buffers → map-side partial
  * aggregation, Encoder-serialized between stages).
  */
object Aggregators {

  /** Weighted average with exact decimal accumulation: partial sums
    * are BigDecimal so the result is independent of partition merge
    * order (double accumulation would make results run-dependent and
    * break oracle hash-parity).
    */
  class WeightedAverage(scale: Int = 4)
      extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

    private def dec(d: Double): BigDecimal =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)

    override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

    override def reduce(b: (BigDecimal, BigDecimal),
                        in: (Double, Double)): (BigDecimal, BigDecimal) = {
      val (v, w) = in
      (b._1 + dec(v) * dec(w), b._2 + dec(w))
    }

    override def merge(a: (BigDecimal, BigDecimal),
                       b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (a._1 + b._1, a._2 + b._2)

    override def finish(r: (BigDecimal, BigDecimal)): Double =
      if (r._2 == BigDecimal(0)) Double.NaN
      else BigDecimal(r._1.toDouble / r._2.toDouble)
        .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.product[(BigDecimal, BigDecimal)]

    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
