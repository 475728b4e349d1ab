package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** X3 — the custom-UDAF surface (SURVEY §2.10): a mergeable moments sketch
  * (count/sum/sum-of-squares) exposed as a typed `Aggregator`. The reference
  * has no UDAF; this is the engine-extension point a mergeable sketch would
  * use (same merge-shape as HLL/quantile sketches: associative partial
  * states merged map-side, so the shuffle carries one small buffer per
  * group, never raw rows).
  */
object StatsAgg {

  final case class Moments(n: Long, sum: Double, sumSq: Double) {
    def add(x: Double): Moments = Moments(n + 1, sum + x, sumSq + x * x)
    def merge(o: Moments): Moments = Moments(n + o.n, sum + o.sum, sumSq + o.sumSq)
    /** Sample standard deviation (n-1 denominator, matching stddev_samp). */
    def stddev: Double =
      if (n < 2) Double.NaN
      else math.sqrt((sumSq - sum * sum / n) / (n - 1))
  }

  val stddev: Aggregator[Double, Moments, Double] =
    new Aggregator[Double, Moments, Double] {
      def zero: Moments = Moments(0L, 0.0, 0.0)
      def reduce(b: Moments, a: Double): Moments = b.add(a)
      def merge(b1: Moments, b2: Moments): Moments = b1.merge(b2)
      def finish(r: Moments): Double = r.stddev
      def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
