package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact `(a·h + b) mod p` for the MinHash family, p = 2⁶¹−1 (Mersenne).
  *
  * The multiplier `a` is FULL-RANGE in [1, p−1] — this is what makes each
  * slot an (approximately) independent random permutation of the shingle
  * hashes. Round 9 and earlier used `a ∈ [1, 4095]`, under which
  * `a·h + b` (h being 48-bit) wraps mod p AT MOST ONCE, so the map is
  * mostly order-preserving: every no-wrap slot selects the argmin of the
  * SAME raw shingle hash, slots agree or disagree together, and realized
  * pair recall collapses far below the per-slot-J independence the S-curve
  * assumes (a planted J = 0.9 pair was observed with ZERO of 64 slots
  * agreeing through its extra-element side — a 4e-8 event under the
  * independence model). The oracle replayed the same weak family, so the
  * correctness gate never saw it; only recall vs ground truth does
  * (DedupSpec "LSH candidate recall tracks the banding S-curve").
  *
  * Full-range `a` needs the 128-bit product: `Math.multiplyHigh` (both
  * operands nonnegative < 2⁶³, so the signed high word IS the unsigned
  * one), then a Mersenne fold — 2⁶⁴ ≡ 8 and 2⁶¹ ≡ 1 (mod p). DuckDB
  * oracles compute the identical value as
  * `((sh::HUGEINT * a + b) % p)::BIGINT` (exact int128 arithmetic).
  */
object MinHashMod {
  val P: Long = (1L << 61) - 1

  @inline def mulAddModP(h: Long, a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, h) // product = hi·2⁶⁴ + lo (lo unsigned)
    val lo = a * h
    // product mod p: hi·2⁶⁴ ≡ hi·8; lo = loTop·2⁶¹ + lo61 ≡ loTop + lo61.
    // h < 2⁶¹ and a < 2⁶¹ ⇒ product < 2¹²² ⇒ hi < 2⁵⁸ ⇒ (hi<<3) < 2⁶¹,
    // so the sum below is < 3·2⁶¹ and one fold + one subtract suffice.
    val sum = (hi << 3) + (lo >>> 61) + (lo & P)
    var r = (sum & P) + (sum >>> 61)
    if (r >= P) r -= P
    r += b // b < p ⇒ r < 2p < 2⁶³
    if (r >= P) r -= P
    r
  }
}

/** MinHash signature as ONE imperative aggregate (`TypedImperativeAggregate`
  * with a primitive `Array[Long]` buffer) — the sketch-aggregation shape the
  * Catalyst aggregate framework is built for.
  *
  * Equivalent to `agg(min((h*a₀+b₀) % p), …, min((h*a₆₃+b₆₃) % p))` but with
  * one buffer object per group instead of 64 separate min-aggregate slots,
  * and one tight loop per input row. Partial aggregation works as usual:
  * `update` folds rows map-side, `merge` combines two signature buffers by
  * element-wise min (associative + commutative, so the result is identical
  * under any partitioning — the 100 TB determinism rule).
  *
  * @param child 48-bit shingle hash column (see [[HashedShingles]])
  * @param coeffs flattened (a, b) pairs of the k hash functions
  * @param p modulus (Mersenne 2⁶¹-1)
  */
case class MinHashSigAgg(
    child: Expression,
    coeffs: Seq[(Long, Long)],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(p == MinHashMod.P, s"MinHash modulus must be 2^61-1, got $p")
  private val k = coeffs.length
  @transient private lazy val as: Array[Long] = coeffs.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = coeffs.map(_._2).toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs BIGINT, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < k) {
        val m = MinHashMod.mulAddModP(h, as(j), bs(j))
        if (m < buf(j)) buf(j) = m
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
}

object MinHashSigAgg {
  /** Aggregate Column producing the k-long signature array of a group. */
  def sig(shingleHash: Column, coeffs: Seq[(Long, Long)], p: Long): Column =
    GraftInterop.column(
      MinHashSigAgg(GraftInterop.expression(shingleHash), coeffs, p)
        .toAggregateExpression())

  /** Row-level Column form of [[MinHashSigArr]]. */
  def sigArr(shingleHashes: Column, coeffs: Seq[(Long, Long)], p: Long): Column =
    GraftInterop.column(MinHashSigArr(GraftInterop.expression(shingleHashes), coeffs, p))
}

/** MinHash signature of ONE row's shingle-hash array — the map-side twin of
  * [[MinHashSigAgg]] for pipelines that already hold each document's shingle
  * set as an array column (one tight loop per row, no aggregation). Same
  * hash family, bit-identical output: `sig[j] = min over h of (h·aⱼ+bⱼ) mod p`.
  * Docs whose array is empty yield `Long.MaxValue` slots — callers filter
  * empty sets upstream (an empty shingle set has no Jaccard neighbors).
  */
case class MinHashSigArr(child: Expression, coeffs: Seq[(Long, Long)], p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(p == MinHashMod.P, s"MinHash modulus must be 2^61-1, got $p")
  private val k = coeffs.length
  @transient private lazy val as: Array[Long] = coeffs.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = coeffs.map(_._2).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<BIGINT>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig_arr"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val m = MinHashMod.mulAddModP(h, as(j), bs(j))
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigArr =
    copy(child = newChild)
}
