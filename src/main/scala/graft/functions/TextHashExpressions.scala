package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `HashedShingles(text, n)`: positional 48-bit hashes of the word n-gram
  * shingles of lowercased, whitespace-tokenized text — the entire
  * shingle-hash pipeline of [[graft.operators.Dedup]] /
  * [[graft.operators.TextAnalysis]] as ONE expression.
  *
  * Semantically identical (bit-for-bit, asserted in TextHashSpec) to the
  * composable form
  * `transform(shingles(split(lower(trim(text)), " +"), n), s => h48(s))`,
  * but evaluated as a single JVM loop per row instead of an interpreted
  * higher-order-function tree per array element (lambda dispatch + boxing
  * + one Catalyst `md5`/`conv` tree per shingle). CodegenFallback is fine
  * here: the win is inside the row, and one virtual call per row does not
  * break the surrounding stage the way per-element interpretation does.
  *
  * Kept exactly oracle-compatible: md5 of the UTF-8 shingle bytes, first
  * 12 hex digits as a positive 48-bit long — DuckDB computes the same via
  * `('0x' || substr(md5(s), 1, 12))::BIGINT`.
  */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles"

  @transient private lazy val hexDigits = "0123456789abcdef".toCharArray

  override protected def nullSafeEval(input: Any): Any = {
    // Tokenization mirrors split(lower(trim(text)), " +") — ASCII-space
    // trim and split, UTF8String-native lowercase (locale-independent,
    // same as Spark's Lower expression).
    val text = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val toks = if (text.isEmpty) Array.empty[String] else text.split(" +")
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])

    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 12 hex digits = first 6 bytes
      var h = 0L
      var b = 0
      while (b < 6) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** `SimHash48(text)`: the whole SimHash sketch as one expression — distinct
  * whitespace tokens of lowercased text, 48-bit md5 hash per token, ±1 bit
  * votes, sign → bits. Replaces an explode + 48-column groupBy aggregate
  * (a full shuffle of every token) with a pure map-side loop: the sketch
  * of a 100 TB corpus becomes a single scan with NO shuffle at all.
  * Bit-identical to [[graft.operators.Dedup.simhash]]'s aggregate form and
  * the DuckDB oracle (vote sums are integer, order-free).
  */
case class SimHash48(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash48"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val toks: Array[String] = if (text.isEmpty) Array.empty else text.split(" +")
    val distinct = new java.util.LinkedHashSet[String]()
    toks.foreach(distinct.add)
    val votes = new Array[Int](48)
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = distinct.iterator()
    while (it.hasNext) {
      val t = it.next()
      md.reset()
      val digest = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 6) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
      var bit = 0
      while (bit < 48) {
        if (((h >> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
    }
    var sim = 0L
    var bit = 0
    while (bit < 48) { if (votes(bit) > 0) sim |= (1L << bit); bit += 1 }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object TextHashFunctions {
  /** Column form of [[HashedShingles]]. */
  def hashedShingles(text: Column, n: Int): Column =
    GraftInterop.column(HashedShingles(GraftInterop.expression(text), n))

  /** Column form of [[SimHash48]]. */
  def simhash48(text: Column): Column =
    GraftInterop.column(SimHash48(GraftInterop.expression(text)))
}
