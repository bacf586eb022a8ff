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

  /** K-minimum-values ("bottom-k" / theta) distinct sketch: keeps the
    * k smallest DISTINCT unit-hash values seen. Unlike HLL (q34,
    * `approx_count_distinct`), a KMV sketch supports SET ALGEBRA —
    * intersection and union estimates across groups (Beyer et al.,
    * SIGMOD'07; the DataSketches theta sketch family) — which is what
    * audience-overlap / cross-channel-distinct questions need.
    *
    * Scale shape: the buffer is a bounded sorted Vector (≤ k doubles),
    * `merge` is associative+commutative, so Spark runs it as a map-side
    * partial aggregate — each executor reduces its partitions to one
    * k-vector and only sketches cross the shuffle, never raw keys.
    * Per-row reduce is a single O(1) threshold reject once the buffer
    * is full (only hashes below the current kth value pay the O(k)
    * vector insert — a vanishing fraction as the scan proceeds).
    *
    * The result (k smallest distinct values of a set) is independent
    * of arrival and merge order, so the output is deterministic and
    * exactly replayable by any engine that sorts the same hashes —
    * the oracle replays it with a rank window over DISTINCT md5 units.
    */
  class KmvSketch(k: Int)
      extends Aggregator[Double, Vector[Double], Seq[Double]] {
    require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")

    override def zero: Vector[Double] = Vector.empty

    private def insert(b: Vector[Double], u: Double): Vector[Double] = {
      if (b.length == k && u >= b(k - 1)) b // O(1) fast path
      else {
        import scala.collection.Searching._
        b.search(u) match {
          case Found(_) => b // already present — sketch keeps DISTINCT values
          case InsertionPoint(i) =>
            ((b.take(i) :+ u) ++ b.drop(i)).take(k)
        }
      }
    }

    override def reduce(b: Vector[Double], u: Double): Vector[Double] =
      insert(b, u)

    override def merge(a: Vector[Double], b: Vector[Double]): Vector[Double] =
      if (a.length < b.length) a.foldLeft(b)(insert) // insert smaller into larger
      else b.foldLeft(a)(insert)

    override def finish(b: Vector[Double]): Seq[Double] = b

    override def bufferEncoder: Encoder[Vector[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Double]]()

    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
