package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

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

/** Late-interaction MaxSim (Khattab & Zaharia 2020, ColBERT §3.1) over
  * multi-vector representations packed into ONE array column: both inputs
  * are `m` contiguous subvectors of width `len/m`, and the score is
  * `Σ_i max_j dot(q_i, d_j)` — each query subvector matches its best
  * document subvector, summed over query subvectors.
  *
  * The composed form (m² `dotd(slice(q,…), slice(d,…))` columns,
  * `greatest` per i, `+` across i) materializes 2·m² sliced array copies
  * per pair; this expression walks both arrays in place with one fused
  * loop nest — the same per-dot sequential multiply-add order and the
  * same i-ascending summation order, so scores are bit-identical to the
  * composed form and to the generated DuckDB oracle
  * ([[graft.operators.Similarity]] q168). Max ties across j are
  * value-ties only (the winning VALUE is the term) — no id tie-break is
  * needed inside the expression.
  *
  * Null when either array's length differs from the other's or is not
  * divisible by `m` (the composed form's null-poisoned aggregate).
  */
case class MaxSimD(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (DoubleType | FloatType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) if m >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs and m >= 1, " +
          s"got (${left.dataType}, ${right.dataType}, m=$m)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_maxsim"

  private def get(x: ArrayData, t: DataType, i: Int): Double = t match {
    case DoubleType => x.getDouble(i)
    case _          => x.getFloat(i).toDouble
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n % m != 0) return null
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    val sub = n / m
    var total = 0.0
    var i = 0
    while (i < m) {
      var best = Double.NegativeInfinity
      var j = 0
      while (j < m) {
        var s = 0.0
        var d = 0
        while (d < sub) {
          s += get(x, lt, i * sub + d) * get(y, rt, j * sub + d)
          d += 1
        }
        if (s > best) best = s
        j += 1
      }
      total += best
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def acc(v: String, t: DataType, i: String): String = t match {
        case DoubleType => s"$v.getDouble($i)"
        case _          => s"((double) $v.getFloat($i))"
      }
      val n = ctx.freshName("n")
      val sub = ctx.freshName("sub")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val total = ctx.freshName("total")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements() || $n % $m != 0) {
          ${ev.isNull} = true;
        } else {
          int $sub = $n / $m;
          double $total = 0.0;
          for (int $i = 0; $i < $m; $i++) {
            double $best = Double.NEGATIVE_INFINITY;
            for (int $j = 0; $j < $m; $j++) {
              double $s = 0.0;
              for (int $d = 0; $d < $sub; $d++) {
                $s += ${acc(a, elemType(left).get, s"$i * $sub + $d")}
                    * ${acc(b, elemType(right).get, s"$j * $sub + $d")};
              }
              if ($s > $best) { $best = $s; }
            }
            $total += $best;
          }
          ${ev.value} = $total;
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MaxSimD =
    copy(left = newLeft, right = newRight)
}

/** All hyperplane-LSH bucket ids of a vector in ONE pass.
  *
  * `annLsh` needs `tables × planes` signed dot products per vector; as
  * composable columns that is (24 × 4 =) 96 separate expressions, each
  * re-reading the array with its own loop. This expression copies the
  * vector once and walks a flat weight matrix in a single fused loop nest —
  * the same sequential multiply-add order per plane as [[DotProductD]], so
  * the sign bits (and therefore every bucket id) are bit-identical to the
  * composed form and to the generated DuckDB oracle
  * ([[graft.operators.Similarity.q34OracleSql]]).
  *
  * A vector whose length differs from the planes' dimension yields null
  * (the composed form would degenerate to bucket 0 via null-padded
  * zip_with; embeddings are fixed-dim so neither path is ever taken).
  */
case class HyperplaneBuckets(child: Expression, flatPlanes: Seq[Double],
                             tables: Int, planes: Int)
    extends UnaryExpression {

  private val dim = flatPlanes.length / (tables * planes)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_buckets"

  @transient private lazy val w: Array[Double] = flatPlanes.toArray

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (elemIsDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var p = 0
      while (p < planes) {
        var s = 0.0
        val off = (t * planes + p) * dim
        var d = 0
        while (d < dim) { s += v(d) * w(off + d); d += 1 }
        if (s >= 0) b |= (1L << p)
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hyperplanes", w, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val off = ctx.freshName("off")
      val get = if (elemIsDouble) s"$a.getDouble($d)" else s"((double) $a.getFloat($d))"
      s"""
        if ($a.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          double[] $v = new double[$dim];
          for (int $d = 0; $d < $dim; $d++) { $v[$d] = $get; }
          long[] $out = new long[$tables];
          for (int $t = 0; $t < $tables; $t++) {
            long $b = 0L;
            for (int $p = 0; $p < $planes; $p++) {
              double $s = 0.0;
              int $off = (($t * $planes) + $p) * $dim;
              for (int $d = 0; $d < $dim; $d++) { $s += $v[$d] * $wRef[$off + $d]; }
              if ($s >= 0.0) { $b |= (1L << $p); }
            }
            $out[$t] = $b;
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
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

  /** Codegen'd late-interaction MaxSim over `m` packed subvectors. */
  def maxsimd(a: Column, b: Column, m: Int): Column =
    GraftInterop.column(MaxSimD(
      GraftInterop.expression(a), GraftInterop.expression(b), m))

  /** All `hp` LSH bucket ids of `v` as one array<long> (fused loop). */
  def hyperplaneBuckets(v: Column, hp: Seq[Seq[Seq[Double]]]): Column = {
    val (tables, planes) = (hp.length, hp.head.length)
    GraftInterop.column(HyperplaneBuckets(
      GraftInterop.expression(v), hp.flatten.flatten, tables, planes))
  }
}
