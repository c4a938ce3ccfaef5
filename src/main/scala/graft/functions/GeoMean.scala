package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY.md §2.10 UDAF surface): geometric mean via
  * log-sum — the distributed-safe formulation (a product of 10^8 values
  * over/underflows; a log sum does not, and merges associatively across
  * partial aggregates, so it map-side combines like any built-in).
  */
case class GeoMeanBuf(var logSum: Double, var n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf = {
    b.logSum += math.log(x); b.n += 1; b
  }
  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf =
    GeoMeanBuf(a.logSum + b.logSum, a.n + b.n)
  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
