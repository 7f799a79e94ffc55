package graft.graph

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Kahan-compensated summation as a typed `Aggregator`, used for PageRank
  * contribution sums so that shuffle-order nondeterminism stays far below
  * the 1e-6 reproducibility bound (SURVEY.md §2.11): the compensated error
  * is O(eps) instead of O(n·eps) for naive summation.
  */
object KahanSum extends Aggregator[Double, (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), x: Double): (Double, Double) = add(b, x)

  // A state (sum, c) represents sum - c (c is the error to subtract from the
  // next input), so folding in a partial state must negate its compensation:
  // adding +c_b instead of -c_b would reintroduce ~2·c_b of uncompensated
  // error per partition merge.
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    add(add(a, b._1), -b._2)

  private def add(b: (Double, Double), x: Double): (Double, Double) = {
    val (sum, c) = b
    val y = x - c
    val t = sum + y
    (t, (t - sum) - y)
  }

  // the state represents sum - c (see merge), so the final compensation
  // must be applied here too — returning b._1 alone would throw away one
  // compensated term exactly at the output boundary
  override def finish(b: (Double, Double)): Double = b._1 - b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `kahan_sum(expr)`. */
  def column(c: Column): Column = udaf(KahanSum).apply(c)
}
