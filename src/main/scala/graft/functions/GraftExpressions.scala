package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hottest scalar kernels —
  * document fingerprinting, SimHash, and the per-pair dot product.
  *
  * Why expressions and not UDFs (the 100-TB lens): a `ScalaUDF` in a
  * whole-stage-codegen'd operator pays, per row, a catalyst-to-Scala
  * converter on every argument, a `java.lang.String` materialization of each
  * UTF8String, boxed returns, and a megamorphic `function.apply` dispatch.
  * These nodes generate a direct static call into [[HashKernels]] inside the
  * produced Java (`doGenCode`), read UTF8String/ArrayData storage in place,
  * and return primitives — nothing is allocated on the per-row path for
  * fingerprint/simhash, and the per-PAIR dot product drops the zipped
  * intermediate array the `aggregate(zip_with(...))` higher-order form (which
  * never codegens — HigherOrderFunction is interpreted-only) built per
  * candidate pair.
  *
  * Bit-identity with the UDF/HOF forms they replace is the contract:
  * spec-asserted in FunctionsSpec over adversarial inputs (non-BMP,
  * surrogates, empty, null), and pinned end-to-end by the driver's bit-exact
  * DuckDB oracles (t_fingerprint, d_exact_dedup, d_simhash, e_lsh_top1).
  */
object GraftExpressions {

  /** `Column` wrapper: 64-bit polynomial fingerprint of a string (null → 0,
    * matching the UDF form's null contract). */
  def fingerprint64(text: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    coalesce(
      GraftSqlBridge.column(Fingerprint64(GraftSqlBridge.expression(text))),
      lit(0L))
  }

  /** `Column` wrapper: 64-bit SimHash of a token array (null array → 0,
    * matching the UDF form, whose zero-vote path yields 0). */
  def simhash64(toks: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    coalesce(
      GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(toks))),
      lit(0L))
  }

  /** `Column` wrapper: whitespace tokens of a string (null → null, matching
    * the regex/HOF form's propagation). */
  def whitespaceTokens(text: Column): Column =
    GraftSqlBridge.column(WhitespaceTokens(GraftSqlBridge.expression(text)))

  /** `Column` wrapper: sequential dot product over two double arrays. The
    * cast to `array<double>` is a no-op for already-double inputs (removed
    * by SimplifyCasts) and the same per-element widening `zip_with`'s
    * `cast("double")` applied for float inputs. */
  def dot(x: Column, y: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(x.cast("array<double>")),
      GraftSqlBridge.expression(y.cast("array<double>"))))
}

/** Whitespace tokenizer (see [[HashKernels.whitespaceTokens]]) — maximal
  * runs of non-`\s` characters, bit-identical to the
  * `filter(split(trim(text), "\\s+"), length > 0)` form every oracle
  * replays. Null in → null out (same as the regex form's null propagation).
  * Codegen'd, so tokenize → count/hash pipelines stay in one whole-stage
  * loop instead of falling back to the interpreted higher-order `filter`. */
case class WhitespaceTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  protected override def nullSafeEval(input: Any): Any =
    HashKernels.whitespaceTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.whitespaceTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

/** 64-bit polynomial rolling hash of a string's UTF-16 code units
  * (see [[HashKernels.polyHash]]). Null in → null out (wrap in coalesce for
  * the UDF's null → 0 contract). */
case class Fingerprint64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"

  protected override def nullSafeEval(input: Any): Any =
    HashKernels.polyHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.polyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** 64-bit SimHash of an `array<string>` token column
  * (see [[HashKernels.simhash]]). Null array in → null out. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  protected override def nullSafeEval(input: Any): Any =
    HashKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Sequential ascending-index dot product of two `array<double>` columns —
  * the same left fold (same FP rounding order) as
  * `aggregate(zip_with(x, y, (p,q) => p*q), 0.0, (acc,v) => acc+v)`, with the
  * same null semantics: null whenever either array is null, the lengths
  * differ, or any element is null (zip_with pads the shorter side with nulls
  * and one null product nulls the whole fold). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (HashKernels.dotDefined(x, y)) HashKernels.dot(x, y) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (graft.functions.HashKernels.dotDefined($a, $b)) {
         |  ${ev.value} = graft.functions.HashKernels.dot($a, $b);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
