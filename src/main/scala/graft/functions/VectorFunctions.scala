package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector expressions for the similarity/dedup hot path.
  *
  * The generic route — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is a
  * Catalyst higher-order function: correct, but interpreted per element
  * (lambda call per array slot, boxing) and opaque to whole-stage codegen.
  * On an all-pairs cosine over 2 000 × 64-float vectors that costs ~80 s at
  * sf0.1. [[DotProductD]] is the same left-to-right summation as a tight
  * generated `for` loop over the array's primitive storage — identical
  * results bit-for-bit (same operation order), ~40× faster, and it keeps
  * the surrounding filter/project inside one codegen stage.
  *
  * Element nulls are not expected (embedding vectors are dense); a null
  * ARRAY input yields null via BinaryExpression's default null handling,
  * and mismatched-length arrays yield null — the same result as the HOF
  * form, whose `zip_with` pads the shorter array with nulls and so
  * poisons the aggregate (keeping the [[graft.plans.FuseDotProduct]]
  * rewrite a true no-op on results).
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (DoubleType | FloatType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got (${left.dataType}, ${right.dataType})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Reads float arrays directly (promoted to double per element, the same
  // value as an up-front cast) so no `transform(cast)` higher-order wrapper
  // is needed — HOFs are CodegenFallback and would break the codegen stage.
  private def get(x: ArrayData, t: DataType, i: Int): Double = t match {
    case DoubleType => x.getDouble(i)
    case _          => x.getFloat(i).toDouble
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += get(x, lt, i) * get(y, rt, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def acc(v: String, t: DataType, i: String): String = t match {
        case DoubleType => s"$v.getDouble($i)"
        case _          => s"((double) $v.getFloat($i))"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += ${acc(a, elemType(left).get, i)} * ${acc(b, elemType(right).get, i)};
          }
          ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Codegen'd dot product of two array<float|double> columns. */
  def dotd(a: Column, b: Column): Column =
    GraftInterop.column(DotProductD(GraftInterop.expression(a), GraftInterop.expression(b)))

  /** Identity passthrough kept for API symmetry: [[DotProductD]] reads
    * float arrays natively, so no cast projection is needed (a
    * `transform(cast)` wrapper would be a CodegenFallback HOF and break
    * whole-stage codegen around the hot loop).
    */
  def toDense(c: Column): Column = c

  /** L2 norm (sequential sum, matches the oracle's operand order). */
  def norm2(a: Column): Column = sqrt(dotd(a, a))

  /** Cosine similarity of two double-array columns — same value as
    * [[graft.operators.Dedup.cosine]] / DuckDB `list_cosine_similarity`
    * on DOUBLE[], computed by the codegen'd expression.
    */
  def cosineFast(a: Column, b: Column): Column =
    dotd(a, b) / (norm2(a) * norm2(b))
}
