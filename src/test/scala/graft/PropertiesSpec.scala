package graft

import graft.repl.{Retry, VerifyResult}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the pure engine logic (SURVEY.md §5:
  * idempotence, watermark monotonicity, dedup invariants). Drives
  * ScalaCheck generators directly (the scalatest bridge artifact is not in
  * the offline cache).
  */
class PropertiesSpec extends AnyFunSuite {

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(body: (A, B, C) => Unit): Unit = {
    var seed = Seed(42L)
    (1 to 300).foreach { _ =>
      val a = ga.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val b = gb.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val c = gc.pureApply(Gen.Parameters.default, seed); seed = seed.next
      body(a, b, c)
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(ga, gb, Gen.const(()))((a, b, _) => body(a, b))

  test("five-way verify: total, deterministic, and consistent with order") {
    forAll(Gen.option(Gen.chooseNum(0L, 1000L)), Gen.chooseNum(0L, 1000L),
      Gen.option(Gen.chooseNum(0L, 1000L))) { (post, dump, prior) =>
      val r = VerifyResult.of(post, dump, prior)
      post match {
        case None => assert(r == VerifyResult.Unknown)
        case Some(p) =>
          if (prior.contains(p) && p == dump) assert(r == VerifyResult.NoOp)
          else if (p == dump) assert(r == VerifyResult.Success)
          else if (p < dump) assert(r == VerifyResult.Behind)
          else assert(r == VerifyResult.Ahead)
      }
      // deterministic
      assert(VerifyResult.of(post, dump, prior) == r)
    }
  }

  test("success/noop imply watermark caught up; behind implies it did not") {
    forAll(Gen.chooseNum(0L, 100L), Gen.chooseNum(0L, 100L)) { (post, dump) =>
      VerifyResult.of(Some(post), dump, None) match {
        case VerifyResult.Success | VerifyResult.NoOp => assert(post == dump)
        case VerifyResult.Behind                      => assert(post < dump)
        case VerifyResult.Ahead                       => assert(post > dump)
        case VerifyResult.Unknown                     => fail("post defined")
      }
    }
  }

  test("retry: succeeds on attempt k for any k <= n, throws for k > n") {
    forAll(Gen.chooseNum(1, 5), Gen.chooseNum(1, 8)) { (failures, maxAttempts) =>
      var calls = 0
      def body(): Unit = { calls += 1; if (calls <= failures) throw new RuntimeException("x") }
      if (failures < maxAttempts) {
        val attempts = Retry.retry(maxAttempts, 0)(body())
        assert(attempts == failures + 1)
      } else {
        intercept[RuntimeException](Retry.retry(maxAttempts, 0)(body()))
        assert(calls == maxAttempts)
      }
    }
  }

  test("minhash coefficients: overflow-free domain and full determinism") {
    val cs = graft.operators.Dedup.minhashCoeffs
    assert(cs.size == graft.operators.Dedup.MinHashK)
    assert(cs == graft.operators.Dedup.minhashCoeffs) // stable across calls
    cs.foreach { case (a, b) =>
      assert(a >= 1 && a <= 4095)
      assert(b >= 0 && b < (1L << 61) - 1)
      // a * h48max + b stays within Long
      val worst = java.math.BigInteger.valueOf(a)
        .multiply(java.math.BigInteger.valueOf((1L << 48) - 1))
        .add(java.math.BigInteger.valueOf(b))
      assert(worst.bitLength() <= 62, s"a=$a b=$b overflows")
    }
  }

  test("jaccard from intersection/sizes is bounded and symmetric") {
    forAll(Gen.chooseNum(0, 500), Gen.chooseNum(1, 500), Gen.chooseNum(1, 500)) {
      (i0, sa, sb) =>
        val i = math.min(i0, math.min(sa, sb))
        val j = i.toDouble / (sa + sb - i)
        assert(j >= 0.0 && j <= 1.0)
        assert(j == i.toDouble / (sb + sa - i)) // symmetric
        if (i == sa && i == sb) assert(j == 1.0)
    }
  }
}
