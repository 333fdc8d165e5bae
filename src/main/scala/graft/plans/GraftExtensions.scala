package graft.plans

import graft.functions.{DotProductD, HashedShingles, HyperplaneBuckets, MinHashSigArr, SimHash48}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Engine extensions, installed with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` — the
  * SQL surface a Hive-SQL user gets after switching to this library:
  *
  *  - `graft_dot(array, array)` → [[DotProductD]];
  *  - `graft_cosine(array, array)` → fused cosine similarity;
  *  - `graft_simhash48(text)` / `graft_hashed_shingles(text, n)` → the
  *    text-sketch expressions;
  *  - `graft_minhash_sig(hashes)` → the standard 64-slot MinHash signature
  *    (same coefficient family the dedup operators use);
  *  - `graft_hyperplane_buckets(vec, tables, planes, dim)` → all LSH
  *    bucket ids of a vector in one fused pass;
  *  - optimizer rule [[FuseDotProduct]] that rewrites the declarative
  *    higher-order-function dot-product idiom
  *    `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
  *    into the codegen'd native expression. Users (and the engine's own
  *    reference implementations) can keep writing the composable HOF form;
  *    the optimizer swaps in the ~40× faster fused loop. Identical result:
  *    same left-to-right summation order.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def intArg(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductD(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        val (a, b) = (children.head, children(1))
        Divide(DotProductD(a, b),
          Multiply(Sqrt(DotProductD(a, a)), Sqrt(DotProductD(b, b))))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash48"),
      new ExpressionInfo(classOf[SimHash48].getName, "graft_simhash48"),
      (children: Seq[Expression]) => SimHash48(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hashed_shingles"),
      new ExpressionInfo(classOf[HashedShingles].getName, "graft_hashed_shingles"),
      (children: Seq[Expression]) => HashedShingles(children.head,
        intArg(children(1)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigArr].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => MinHashSigArr(children.head,
        graft.operators.Dedup.minhashCoeffs, graft.operators.Dedup.MersenneP)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "graft_hyperplane_buckets"),
      (children: Seq[Expression]) => {
        val (t, p, d) = (intArg(children(1)), intArg(children(2)), intArg(children(3)))
        HyperplaneBuckets(children.head,
          graft.operators.Similarity.hyperplanes(t, p, d).flatten.flatten, t, p)
      }))
    ext.injectOptimizerRule(_ => FuseDotProduct)
  }
}

/** Rewrite `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`
  * (and the self-product `aggregate(a, 0.0, (acc,x) -> acc + x*x)` norm
  * idiom) to [[DotProductD]]. Conservative: fires only on float/double
  * arrays and exactly the multiply-accumulate shapes where the fused loop
  * is bit-identical to the interpreted fold:
  *
  *  - each multiply operand must be DOUBLE at the multiply — either the
  *    lambda var is already double-typed or it is explicitly cast to
  *    double. A bare FLOAT var multiplies in float precision in the HOF
  *    form, which the fused loop (per-element double promotion) would not
  *    replicate, so that shape is left alone;
  *  - mismatched-length arrays return null on both paths ([[DotProductD]]
  *    mirrors zip_with's null padding poisoning the aggregate).
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }

  /** e resolves to lambda var `v` AND is double-valued at the multiply:
    * either the var itself is double-typed, or it is wrapped in an
    * explicit cast to double.
    */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId && nv.dataType == DoubleType
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        DoubleLiteral(0.0),
        LambdaFunction(Add(accRef: NamedLambdaVariable, vRef, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(finishRef: NamedLambdaVariable, Seq(fin: NamedLambdaVariable), _))
      if isVec(a) && isVec(b) &&
        isVar(mx, x) && isVar(my, y) &&
        accRef.exprId == acc.exprId && isVar(vRef, v) &&
        finishRef.exprId == fin.exprId =>
      DotProductD(a, b)

    // aggregate(a, 0.0, (acc, x) -> acc + x * x)   (squared-norm idiom)
    case ArrayAggregate(
        a,
        DoubleLiteral(0.0),
        LambdaFunction(Add(accRef: NamedLambdaVariable, Multiply(mx, my, _), _), Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _),
        LambdaFunction(finishRef: NamedLambdaVariable, Seq(fin: NamedLambdaVariable), _))
      if isVec(a) && isVar(mx, x) && isVar(my, x) &&
        accRef.exprId == acc.exprId && finishRef.exprId == fin.exprId =>
      DotProductD(a, a)
  }
}

/** Extractor for a double literal value. */
private object DoubleLiteral {
  def unapply(e: Expression): Option[Double] = e match {
    case Literal(d: Double, DoubleType) => Some(d)
    case _ => None
  }
}
