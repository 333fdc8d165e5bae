package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass text gates — the per-row language-id and
  * quality-score heuristics of [[graft.operators.TextAnalysis]] collapsed
  * into one tokenize-then-score loop per row.
  *
  * WHY: the composed column forms are CORRECT but their expression trees
  * duplicate the tokenization massively — `langGuessExpr`'s tie-break
  * fold references every language's score inside every branch and `best`
  * inside each of those (≈30 `array_distinct(split(...))` evaluations per
  * row), and `qualityScoreExpr`'s stopword term is a higher-order
  * `filter` (CodegenFallback → the whole predicate subtree evaluates
  * interpreted, outside codegen CSE). Measured on the q155 bootstrap leg:
  * the eligibility gates alone cost seconds on a 5 000-doc corpus.
  *
  * BIT-EXACTNESS: tokenization calls the SAME `UTF8String` methods
  * Spark's `trim`/`lower`/`split` expressions call (`trim()` strips
  * ASCII 32, `toLowerCase`, `split(" +", -1)`), token/profile equality is
  * `UTF8String` byte equality, and the score arithmetic replays the
  * composed form's operation order (`(lenScore*0.4 + least(ttr*2,1)*0.3)
  * + least(stop*10,1)*0.3`, each term double). The composed forms remain
  * the readable spec; the driver's oracle gate (q29/q30/q155 …)
  * hash-verifies the equivalence on every run, and TextAnalysisSpec pins
  * it directly.
  *
  * Codegen emits one virtual call to [[TextGateKernel]] per row — the
  * surrounding filter/projection stays inside whole-stage codegen.
  */
object TextGateKernel {

  private val SpacePlus = UTF8String.fromString(" +")

  /** Tokens of `split(lower(trim(text)), " +")` — the exact Spark call
    * chain ([[graft.util.TextPrep.tokens]]).
    */
  def tokenize(s: UTF8String): Array[UTF8String] =
    s.trim().toLowerCase().split(SpacePlus, -1)

  /** |distinct(toks) ∩ profile| — `size(array_intersect(dtoks, words))`. */
  def intersectCount(dtoks: java.util.LinkedHashSet[UTF8String],
                     profile: java.util.HashSet[UTF8String]): Int = {
    var n = 0
    val it = dtoks.iterator()
    while (it.hasNext) if (profile.contains(it.next())) n += 1
    n
  }

  def distinct(toks: Array[UTF8String]): java.util.LinkedHashSet[UTF8String] = {
    val s = new java.util.LinkedHashSet[UTF8String](toks.length * 2)
    var i = 0
    while (i < toks.length) { s.add(toks(i)); i += 1 }
    s
  }
}

/** `langGuessExpr` fused: distinct-token overlap per profile, argmax with
  * first-profile-wins tie-break, 'und' when every score is 0.
  */
case class LangGuess(child: Expression,
                     profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_guess"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }

  @transient private lazy val profs: Array[(UTF8String, java.util.HashSet[UTF8String])] =
    profiles.map { case (lang, words) =>
      val s = new java.util.HashSet[UTF8String](words.length * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      (UTF8String.fromString(lang), s)
    }.toArray

  @transient private lazy val und = UTF8String.fromString("und")

  def compute(s: UTF8String): UTF8String = {
    val dtoks = TextGateKernel.distinct(TextGateKernel.tokenize(s))
    var best = 0
    val scores = new Array[Int](profs.length)
    var i = 0
    while (i < profs.length) {
      scores(i) = TextGateKernel.intersectCount(dtoks, profs(i)._2)
      if (scores(i) > best) best = scores(i)
      i += 1
    }
    if (best == 0) return und
    i = 0
    while (i < profs.length) {
      if (scores(i) == best) return profs(i)._1
      i += 1
    }
    und
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langGuess", this, classOf[LangGuess].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangGuess =
    copy(child = newChild)
}

/** `qualityScoreExpr` fused, PRE-round: length-band score, type-token
  * ratio, stopword ratio, blended with the composed form's exact double
  * operation order. Callers apply Spark's own `round(_, 6)` on top so the
  * final rounding is literally the same expression as before.
  */
case class QualityScoreRaw(child: Expression, enProfile: Seq[String])
    extends UnaryExpression {

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quality_raw"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }

  @transient private lazy val en: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](enProfile.length * 2)
    enProfile.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def compute(s: UTF8String): Double = {
    val toks = TextGateKernel.tokenize(s)
    val nTok = toks.length
    // distinct count (size(array_distinct(toks)))
    val dtoks = TextGateKernel.distinct(toks)
    // stopword count WITH multiplicity (filter(toks, isin(en)))
    var stopN = 0
    var i = 0
    while (i < nTok) { if (en.contains(toks(i))) stopN += 1; i += 1 }
    val ttr = dtoks.size() * 1.0 / nTok
    val stop = stopN * 1.0 / nTok
    val lenScore =
      if (nTok >= 30 && nTok <= 500) 1.0
      else if (nTok >= 10 && nTok <= 1000) 0.5
      else 0.0
    // exact composed-form op order:
    // (lenScore*0.4 + least(ttr*2,1)*0.3) + least(stop*10,1)*0.3
    lenScore * 0.4 + math.min(ttr * 2.0, 1.0) * 0.3 +
      math.min(stop * 10.0, 1.0) * 0.3
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityRaw", this,
      classOf[QualityScoreRaw].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityScoreRaw =
    copy(child = newChild)
}
