package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Broadcast candidate model for [[NearestId]] / [[PqEncodeCodes]]: the
  * candidates sorted by (key, id), vectors flattened dim-strided, plus the
  * per-candidate precomputed term the metric reuses every row
  * (`sqrt(dot(c,c))` for cosine, `dot(c,c)` for L2) — computed with the
  * same sequential loop as [[DotProductD]] so scores stay bit-identical
  * to the composed-column form. `starts` has `distinctKeys.length + 1`
  * entries; key `distinctKeys(i)`'s candidates are rows
  * `[starts(i), starts(i+1))`. Model-sized by contract (centroids,
  * codebooks — the frames every assignment already broadcasts and the
  * k-means loops already collect): it ships inside the stage's task
  * binary, which Spark broadcasts once per stage.
  */
case class NearestModel(distinctKeys: Array[Long], starts: Array[Int],
                        ids: Array[Long], vecs: Array[Double],
                        aux: Array[Double], dim: Int) {
  def isEmpty: Boolean = ids.isEmpty
}

/** Map-only nearest-candidate id: for each row's vector, the candidate id
  * (among the model's candidates under the row's `key`) with the greatest
  * cosine (`cosine = true`) or the smallest L2 distance (`cosine =
  * false`), ties to the SMALLEST id, NaN scores ordered greatest — the
  * exact extreme/tie/NaN semantics of
  * [[graft.operators.ArgMax.rescoreArgmax]]/`rescoreArgmin`, whose
  * scaladoc carries the determinism story. This is that argmax collapsed
  * into ONE whole-stage-codegen projection: no candidate join, no
  * aggregate, no join-back — the shape a 100 TB assignment wants when the
  * candidate side is model-sized (it always is here: the same frames are
  * collected for quantizer digests and k-means updates already).
  *
  * Score arithmetic is bit-identical to the composed form by replaying
  * its operation order: cosine = `dot(v,c) / (sqrt(dot(v,v)) *
  * sqrt(dot(c,c)))`, L2 = `(dot(v,v) - 2.0*dot(v,c)) + dot(c,c)`, each
  * dot the same left-to-right summation as [[DotProductD]] (float
  * elements promoted per element, exactly as a `cast("array<double>")`).
  *
  * Null when: the vector is null, its length differs from the model dim
  * (the composed form's null-cosine candidates were ignored by `max`,
  * which on an all-null group dropped the key from the argmax output —
  * unreachable on fixed-dim embeddings either way), or the key has no
  * candidates in the model.
  */
case class NearestId(key: Expression, vec: Expression, model: NearestModel,
                     cosine: Boolean) extends BinaryExpression {

  override def left: Expression = key
  override def right: Expression = vec
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (cosine) "graft_nearest_cos" else "graft_nearest_l2"

  private def vecElem: Option[DataType] = vec.dataType match {
    case ArrayType(t @ (DoubleType | FloatType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, vecElem) match {
      case (LongType, Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, array<float|double>), got " +
          s"(${key.dataType}, ${vec.dataType})")
    }

  override protected def nullSafeEval(k: Any, v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = model.dim
    if (arr.numElements() != dim) return null
    val kidx = java.util.Arrays.binarySearch(model.distinctKeys,
      k.asInstanceOf[Long])
    if (kidx < 0) return null
    val isD = vecElem.contains(DoubleType)
    val x = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      x(d) = if (isD) arr.getDouble(d) else arr.getFloat(d).toDouble
      d += 1
    }
    var vv = 0.0
    d = 0
    while (d < dim) { vv += x(d) * x(d); d += 1 }
    val vn = math.sqrt(vv)
    var bestId = 0L; var bestScore = 0.0; var first = true
    var c = model.starts(kidx)
    val end = model.starts(kidx + 1)
    while (c < end) {
      var dot = 0.0
      val off = c * dim
      d = 0
      while (d < dim) { dot += x(d) * model.vecs(off + d); d += 1 }
      val score =
        if (cosine) dot / (vn * model.aux(c))
        else (vv - 2.0 * dot) + model.aux(c)
      val better =
        if (cosine) score > bestScore ||
          (java.lang.Double.isNaN(score) && !java.lang.Double.isNaN(bestScore))
        else score < bestScore ||
          (!java.lang.Double.isNaN(score) && java.lang.Double.isNaN(bestScore))
      if (first || better) { first = false; bestScore = score; bestId = model.ids(c) }
      c += 1
    }
    if (first) null else bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dks = ctx.addReferenceObj("nearestKeys", model.distinctKeys, "long[]")
    val starts = ctx.addReferenceObj("nearestStarts", model.starts, "int[]")
    val ids = ctx.addReferenceObj("nearestIds", model.ids, "long[]")
    val vecs = ctx.addReferenceObj("nearestVecs", model.vecs, "double[]")
    val aux = ctx.addReferenceObj("nearestAux", model.aux, "double[]")
    val dim = model.dim
    nullSafeCodeGen(ctx, ev, (k, v) => {
      val get = if (vecElem.contains(DoubleType)) (i: String) => s"$v.getDouble($i)"
                else (i: String) => s"((double) $v.getFloat($i))"
      val x = ctx.freshName("x"); val vv = ctx.freshName("vv")
      val vn = ctx.freshName("vn"); val kidx = ctx.freshName("kidx")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val dot = ctx.freshName("dot"); val off = ctx.freshName("off")
      val score = ctx.freshName("score"); val better = ctx.freshName("better")
      val bestId = ctx.freshName("bestId"); val bestS = ctx.freshName("bestS")
      val first = ctx.freshName("first"); val end = ctx.freshName("end")
      val scoreExpr =
        if (cosine) s"$dot / ($vn * $aux[$c])"
        else s"($vv - 2.0 * $dot) + $aux[$c]"
      val betterExpr =
        if (cosine)
          s"$score > $bestS || (Double.isNaN($score) && !Double.isNaN($bestS))"
        else
          s"$score < $bestS || (!Double.isNaN($score) && Double.isNaN($bestS))"
      s"""
        int $kidx = java.util.Arrays.binarySearch($dks, $k);
        if ($v.numElements() != $dim || $kidx < 0) {
          ${ev.isNull} = true;
        } else {
          double[] $x = new double[$dim];
          for (int $d = 0; $d < $dim; $d++) { $x[$d] = ${get(d)}; }
          double $vv = 0.0;
          for (int $d = 0; $d < $dim; $d++) { $vv += $x[$d] * $x[$d]; }
          double $vn = Math.sqrt($vv);
          long $bestId = 0L; double $bestS = 0.0; boolean $first = true;
          int $end = $starts[$kidx + 1];
          for (int $c = $starts[$kidx]; $c < $end; $c++) {
            double $dot = 0.0;
            int $off = $c * $dim;
            for (int $d = 0; $d < $dim; $d++) { $dot += $x[$d] * $vecs[$off + $d]; }
            double $score = $scoreExpr;
            boolean $better = $betterExpr;
            if ($first || $better) { $first = false; $bestS = $score; $bestId = $ids[$c]; }
          }
          if ($first) { ${ev.isNull} = true; } else { ${ev.value} = $bestId; }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestId = copy(key = newLeft, vec = newRight)
}

/** The m ADC table lookups of a PQ `codes` row against a per-query
  * lookup table `pd` (array<array<double>>, `pd[j][code]` = partial dot
  * of the query's j-th subvector with codebook entry `code`):
  * `Σ_j pd[j][codes[j]]` — the asymmetric-distance score of
  * [[graft.operators.Similarity.annPq]]/`annIvfPq`, fused into one
  * codegen'd loop. The composed form — `aggregate(zip_with(codes,
  * sequence(...), element_at ∘ element_at), 0.0, +)` — is three nested
  * higher-order functions, interpreted per element with lambda boxing,
  * and it sat on the n·|queries| hot path (~36 M evaluations per q113
  * run at sf0.1). Same left-to-right fold order, so the sum is
  * bit-identical. Null if either array is null or `codes` length differs
  * from `pd` length; an out-of-range code reads as the composed form's
  * ANSI `element_at` error — unreachable, codes come from the codebooks
  * that built `pd`.
  */
case class AdcSum(codes: Expression, pd: Expression)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = pd
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, pd.dataType) match {
      case (ArrayType(IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<double>>), got $other")
    }

  override protected def nullSafeEval(c: Any, p: Any): Any = {
    val cs = c.asInstanceOf[ArrayData]
    val tbl = p.asInstanceOf[ArrayData]
    val m = cs.numElements()
    if (tbl.numElements() != m) return null
    var s = 0.0
    var j = 0
    while (j < m) { s += tbl.getArray(j).getDouble(cs.getInt(j)); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, p) => {
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
        int $m = $c.numElements();
        if ($p.numElements() != $m) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $j = 0; $j < $m; $j++) {
            $s += $p.getArray($j).getDouble($c.getInt($j));
          }
          ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcSum = copy(codes = newLeft, pd = newRight)
}

/** All `m` PQ code assignments of one vector in a single fused pass —
  * [[NearestId]] (L2 metric, key = subspace `j`) applied to every
  * contiguous `sub`-wide slice of the vector at once, returning
  * `array<int>` in `j` order. Replaces the explode → per-(vec_id, j)
  * argmin → `collect_list` re-assembly of
  * [[graft.operators.Similarity.pqEncode]]'s original pipeline with a
  * pure projection: no explode fan-out, no shuffle, no join. Bit-identical
  * scores by the same arithmetic replay as [[NearestId]] (each slice read
  * promoted per element, `(dot(sv,sv) - 2.0*dot(sv,cv)) + dot(cv,cv)`,
  * ties to the smallest code, NaN greatest). The model's `distinctKeys`
  * must be exactly 0..m-1 (every subspace has candidates — guaranteed by
  * codebook construction); a vector whose length differs from `m * sub`
  * yields null (the composed form dropped such vectors via its inner
  * join-back — unreachable on fixed-dim corpora).
  */
case class PqEncodeCodes(vec: Expression, model: NearestModel, m: Int,
                         sub: Int) extends UnaryExpression {

  override def child: Expression = vec
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  private def vecElem: Option[DataType] = vec.dataType match {
    case ArrayType(t @ (DoubleType | FloatType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = vecElem match {
    case Some(_) if model.distinctKeys.sameElements(
        Array.tabulate(m)(_.toLong)) && model.dim == sub =>
      TypeCheckResult.TypeCheckSuccess
    case Some(_) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName model must cover subspaces 0..${m - 1} at dim $sub")
    case None => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${vec.dataType}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != m * sub) return null
    val isD = vecElem.contains(DoubleType)
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      val x = new Array[Double](sub)
      var d = 0
      while (d < sub) {
        x(d) = if (isD) arr.getDouble(base + d)
               else arr.getFloat(base + d).toDouble
        d += 1
      }
      var vv = 0.0
      d = 0
      while (d < sub) { vv += x(d) * x(d); d += 1 }
      var bestId = 0L; var bestScore = 0.0; var first = true
      var c = model.starts(j)
      val end = model.starts(j + 1)
      while (c < end) {
        var dot = 0.0
        val off = c * sub
        d = 0
        while (d < sub) { dot += x(d) * model.vecs(off + d); d += 1 }
        val score = (vv - 2.0 * dot) + model.aux(c)
        val better = score < bestScore ||
          (!java.lang.Double.isNaN(score) && java.lang.Double.isNaN(bestScore))
        if (first || better) { first = false; bestScore = score; bestId = model.ids(c) }
        c += 1
      }
      out(j) = bestId.toInt
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val starts = ctx.addReferenceObj("pqStarts", model.starts, "int[]")
    val ids = ctx.addReferenceObj("pqIds", model.ids, "long[]")
    val vecs = ctx.addReferenceObj("pqVecs", model.vecs, "double[]")
    val aux = ctx.addReferenceObj("pqAux", model.aux, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val get = if (vecElem.contains(DoubleType)) (i: String) => s"$v.getDouble($i)"
                else (i: String) => s"((double) $v.getFloat($i))"
      val out = ctx.freshName("out"); val j = ctx.freshName("j")
      val base = ctx.freshName("base"); val x = ctx.freshName("x")
      val vv = ctx.freshName("vv"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val dot = ctx.freshName("dot")
      val off = ctx.freshName("off"); val score = ctx.freshName("score")
      val better = ctx.freshName("better"); val bestId = ctx.freshName("bestId")
      val bestS = ctx.freshName("bestS"); val first = ctx.freshName("first")
      val end = ctx.freshName("end")
      s"""
        if ($v.numElements() != ${m * sub}) {
          ${ev.isNull} = true;
        } else {
          int[] $out = new int[$m];
          for (int $j = 0; $j < $m; $j++) {
            int $base = $j * $sub;
            double[] $x = new double[$sub];
            for (int $d = 0; $d < $sub; $d++) { $x[$d] = ${get(s"$base + $d")}; }
            double $vv = 0.0;
            for (int $d = 0; $d < $sub; $d++) { $vv += $x[$d] * $x[$d]; }
            long $bestId = 0L; double $bestS = 0.0; boolean $first = true;
            int $end = $starts[$j + 1];
            for (int $c = $starts[$j]; $c < $end; $c++) {
              double $dot = 0.0;
              int $off = $c * $sub;
              for (int $d = 0; $d < $sub; $d++) { $dot += $x[$d] * $vecs[$off + $d]; }
              double $score = ($vv - 2.0 * $dot) + $aux[$c];
              boolean $better = $score < $bestS ||
                (!Double.isNaN($score) && Double.isNaN($bestS));
              if ($first || $better) { $first = false; $bestS = $score; $bestId = $ids[$c]; }
            }
            $out[$j] = (int) $bestId;
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(vec = newChild)
}
