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

  test("minhash coefficients: full-range domain and full determinism") {
    val p = graft.functions.MinHashMod.P
    val cs = graft.operators.Dedup.minhashCoeffs
    assert(cs.size == graft.operators.Dedup.MinHashK)
    assert(cs == graft.operators.Dedup.minhashCoeffs) // stable across calls
    cs.foreach { case (a, b) =>
      // FULL-RANGE multipliers are the recall contract: a ∈ [1, 2¹²]
      // (round ≤ 9) made every slot mostly order-preserving, so slots
      // agreed/disagreed together and realized LSH recall collapsed (see
      // Dedup.minhashCoeffs). The product is exact mod p via
      // MinHashMod.mulAddModP, so no Long-overflow bound applies.
      assert(a >= 1 && a < p)
      assert(b >= 0 && b < p)
    }
    // multipliers actually EXERCISE the full range (not clustered small —
    // the weak-family failure mode): at least half exceed 2³².
    assert(cs.count(_._1 > (1L << 32)) >= cs.size / 2)
    // slot values stay in [0, p)
    cs.take(8).foreach { case (a, b) =>
      val v = graft.functions.MinHashMod.mulAddModP((1L << 48) - 1, a, b)
      assert(v >= 0 && v < p)
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
