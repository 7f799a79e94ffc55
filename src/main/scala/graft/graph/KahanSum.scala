package graft.graph

import org.apache.spark.sql.{Column, Encoder, Encoders, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, Expression, If, IsNull, Literal, Subtract, UnaryMinus}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Kahan-compensated summation, used for PageRank contribution sums so that
  * shuffle-order nondeterminism stays far below the 1e-6 reproducibility
  * bound (SURVEY.md §2.11): the compensated error is O(eps) instead of
  * O(n·eps) for naive summation.
  *
  * Two forms with IDENTICAL arithmetic (same op order, bit-equal states):
  *
  *  - [[KahanSum]]: the typed `Aggregator` reference form (referee for the
  *    merge-sign semantics; still what the suite's algebra tests exercise).
  *    As a `udaf` it plans as a non-codegen `ScalaAggregator` inside
  *    `ObjectHashAggregate` — per row it pays an encoder round-trip of the
  *    boxed `(Double, Double)` buffer and a megamorphic `reduce` dispatch,
  *    which benched ~6x slower than the plain codegen'd `sum` on the
  *    PageRank contribution aggregate (guide §4 "prefer built-ins": the
  *    same tax as a scalar UDF, but per aggregation row).
  *  - [[KahanSumAgg]]: the same fold as a native `DeclarativeAggregate` —
  *    two primitive double buffer slots updated by codegen'd arithmetic
  *    expressions inside the standard `HashAggregate`, with map-side
  *    partial aggregation exactly like the built-in `sum`. This is what
  *    [[KahanSum.column]] now plans; the Aggregator↔Declarative value
  *    identity is spec-asserted (GraphKernelsSpec).
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

  /** Column form: `kahan_sum(expr)` — plans the codegen'd
    * [[KahanSumAgg]]; [[columnUdaf]] keeps the Aggregator form reachable
    * for the identity spec. */
  def column(c: Column): Column =
    GraftSqlBridge.column(
      KahanSumAgg(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** The original typed-Aggregator plan form (ObjectHashAggregate), kept
    * for the Declarative↔Aggregator identity spec and as the reference. */
  private[graft] def columnUdaf(c: Column): Column = udaf(KahanSum).apply(c)
}

/** Native codegen'd Kahan-compensated sum (see [[KahanSum]] scaladoc for
  * why): buffer `(sum, c)` represents `sum - c`, update/merge/evaluate are
  * the exact expression transcription of the Aggregator's `add`/`merge`/
  * `finish` — same operation order, so the two forms produce bit-identical
  * doubles on identical input order. Null inputs leave the buffer
  * unchanged (built-in `sum` semantics); an empty group evaluates to 0.0
  * (the Aggregator's `finish(zero)`). */
case class KahanSumAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kahan_sum"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kahan_sum needs a DOUBLE input, got ${child.dataType.catalogString}")

  private lazy val sum = AttributeReference("kahan_sum", DoubleType, nullable = false)()
  private lazy val comp = AttributeReference("kahan_c", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sum, comp)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0))

  // add(b, x): y = x - c; t = sum + y; c' = (t - sum) - y
  override lazy val updateExpressions: Seq[Expression] = {
    val y = Subtract(child, comp)
    val t = Add(sum, y)
    val newC = Subtract(Subtract(t, sum), y)
    if (child.nullable) Seq(If(IsNull(child), sum, t), If(IsNull(child), comp, newC))
    else Seq(t, newC)
  }

  // merge(a, b) = add(add(a, b.sum), -b.c) — fold the partial sum, then the
  // NEGATED partial compensation (a state (sum, c) represents sum - c)
  override lazy val mergeExpressions: Seq[Expression] = {
    val y1 = Subtract(sum.right, comp.left)
    val t1 = Add(sum.left, y1)
    val c1 = Subtract(Subtract(t1, sum.left), y1)
    val y2 = Subtract(UnaryMinus(comp.right), c1)
    val t2 = Add(t1, y2)
    val c2 = Subtract(Subtract(t2, t1), y2)
    Seq(t2, c2)
  }

  // finish: the state represents sum - c, so apply the compensation here
  override lazy val evaluateExpression: Expression = Subtract(sum, comp)

  override protected def withNewChildInternal(newChild: Expression): KahanSumAgg =
    copy(child = newChild)
}
