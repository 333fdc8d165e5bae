package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf("sf0.001")).documents.cache()

  test("dfCapFor: fraction of corpus with a small-corpus floor") {
    assert(Dedup.dfCapFor(500) == 20)     // floor
    assert(Dedup.dfCapFor(5000) == 20)    // 4e-3 * 5000 = the tuned cap
    assert(Dedup.dfCapFor(50000) == 200)  // scales with the corpus
    assert(Dedup.dfCapFor(25_000_000_000L) == 100_000_000)
  }

  test("minhash-LSH pairs: exact precision, high recall vs exact Jaccard") {
    val exactPairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.get(0), r.get(1))).toSet
    val lshPairs = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.get(0), r.get(1))).toSet
    // precision 1 by construction (candidates verified with exact Jaccard)
    assert(lshPairs.subsetOf(exactPairs))
    // recall: 32 bands x 2 rows => miss prob ~1e-4 per true pair at j=0.5
    if (exactPairs.nonEmpty)
      assert(lshPairs.size.toDouble / exactPairs.size >= 0.9,
        s"recall ${lshPairs.size}/${exactPairs.size}")
  }

  test("simhash banding finds exactly the all-pairs hamming<=3 set") {
    val banded = Dedup.simhashPairs(docs, "text", "doc_id", 3)
      .select("doc_a", "doc_b").collect().map(r => (r.get(0), r.get(1))).toSet
    val sh = Dedup.simhash(docs, "text", "doc_id")
    val all = sh.as("a").join(sh.as("b"), col("a.doc") < col("b.doc"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
      .select(col("a.doc"), col("b.doc")).collect().map(r => (r.get(0), r.get(1))).toSet
    assert(banded == all)
  }

  test("imperative MinHash signature aggregate equals 64 separate mins") {
    val viaAgg = Dedup.minhashSignatures(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaMins = Dedup.minhashSignaturesViaMins(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (1 to Dedup.MinHashK).map(j => r.getLong(j)).toVector).toMap
    assert(viaAgg == viaMins)
  }

  test("fused SimHash48 expression equals the aggregate formulation") {
    val fused = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simhashViaAggregate(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == agg)
  }

  test("semanticDedup: no two same-cell survivors are near-dups; partition holds") {
    val embs = Tables(spark, sf("sf0.001")).embeddings.cache()
    val t = 0.3 // lower threshold than q74's so the sf0.001 slice has drops
    val res = Dedup.semanticDedup(embs, "embedding", "vec_id", nCells = 8,
      threshold = t).cache()
    // every input vector appears exactly once (partition property)
    assert(res.count() == embs.count())
    assert(res.select("vec_id").distinct().count() == embs.count())
    // greedy min-id rule invariant: among SURVIVORS of the same cell, no
    // pair can reach the threshold (else the larger id would be dropped)
    val surv = res.filter(!col("dropped"))
      .join(embs.select(col("vec_id"), col("embedding")), "vec_id")
    val offenders = surv.as("a").join(surv.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.VectorFunctions.cosineFast(
        col("a.embedding"), col("b.embedding")) >= t)
    assert(offenders.count() == 0)
  }

  test("semanticDedupAuto: dominance invariant holds on hier cells; deterministic") {
    val embs = Tables(spark, sf("sf0.001")).embeddings.cache()
    val t = 0.3
    // small target so the auto sizing actually derives k > the 16 floor
    // (n=500, target=24 -> k=21, coarse=5) and the hier routing runs
    val res = Dedup.semanticDedupAuto(embs, "embedding", "vec_id",
      targetCellSize = 24, threshold = t).cache()
    assert(res.count() == embs.count())
    assert(res.select("vec_id").distinct().count() == embs.count())
    assert(res.select("cell").distinct().count() > 16L) // cells ∝ n engaged
    // the same min-id dominance rule as semanticDedup, on the hier cells:
    // no same-cell survivor pair can reach the threshold
    val surv = res.filter(!col("dropped"))
      .join(embs.select(col("vec_id"), col("embedding")), "vec_id")
    val offenders = surv.as("a").join(surv.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.VectorFunctions.cosineFast(
        col("a.embedding"), col("b.embedding")) >= t)
    assert(offenders.count() == 0)
    // bit-deterministic (broadcast argmax routing, smaller-id ties)
    val again = Dedup.semanticDedupAuto(embs, "embedding", "vec_id",
      targetCellSize = 24, threshold = t)
    assert(res.collect().toSet == again.collect().toSet)
  }

  test("exact dedup keeps the minimum id per group") {
    val d = Dedup.exact(docs, substring(col("text"), 1, 100), col("doc_id"))
    val dups = d.filter(col("group_size") > 1)
    // every keep_id is the min of its group by construction; sanity: total
    // group sizes sum to corpus size
    val total = d.agg(sum("group_size")).head().getLong(0)
    assert(total == docs.count())
    assert(dups.count() >= 0)
  }

  test("duplicated spans: keep-first removal plan on a known corpus") {
    import spark.implicits._
    // doc 1 and doc 2 share a 12-token run (two 10-token windows at k=10);
    // doc 3 repeats its OWN opening 10 tokens later in the same doc;
    // doc 4 shares nothing.
    val run = (1 to 12).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, s"$run tail1 tail2"),
      (2L, s"lead1 lead2 $run"),
      (3L, "a b c d e f g h i j x y a b c d e f g h i j"),
      (4L, "p q r s t u v w x0 y0 z0")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(d, "text", "doc_id")
      .select("doc_id", "pos", "n_occ")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // doc 1 holds the first occurrences (doc_id 1 < 2), so BOTH shared
    // windows are removed from doc 2 at its offsets 3 and 4 (1-based,
    // after the two lead tokens)...
    assert(out.contains((2L, 3, 2L)) && out.contains((2L, 4, 2L)))
    // ...and doc 1 keeps them (no removal rows for doc 1)
    assert(!out.exists(_._1 == 1L))
    // doc 3's self-repeat at pos 13 is removed; its pos-1 original kept
    assert(out.contains((3L, 13, 2L)) && !out.contains((3L, 1, 2L)))
    // doc 4 is untouched
    assert(!out.exists(_._1 == 4L))
  }

  test("duplicated spans: hashed-key scale config equals string keys") {
    val byString = Dedup.duplicatedSpans(docs, "text", "doc_id")
      .select("doc_id", "pos", "n_occ")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val byHash = Dedup.duplicatedSpans(docs, "text", "doc_id", hashKeys = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(byString == byHash)
  }

  test("bloomNewDocs equals the plain batch-vs-corpus join, and the bloom prunes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col, md5, min, udf}
    val isBatch = col("doc_id") % 10 === 0
    val out = Dedup.bloomNewDocs(docs, "text", "doc_id", isBatch,
        expectedItems = 10000L)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(2))).toSet
    // naive reference: exact left join on the text hash
    val c = docs.filter(!isBatch).select(md5(col("text")).as("h"), col("doc_id").as("cid"))
    val b = docs.filter(isBatch).select(col("doc_id"), md5(col("text")).as("h"))
    val ref = b.join(broadcast(c), Seq("h"), "left")
      .groupBy("doc_id").agg(min("cid").as("dup_of"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.isNullAt(1))).toSet
    assert(out == ref)
    // the prefilter must actually prune: on an all-unique synthetic corpus,
    // probe hits are bounded by the false-positive rate, not the batch size
    val uniq = (1L to 2000L).map(i => (i, s"unique document body $i")).toDF("doc_id", "text")
    val bf = uniq.filter(col("doc_id") % 10 =!= 0)
      .select(md5(col("text")).as("h")).stat.bloomFilter("h", 2000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val might = udf((h: String) => bfB.value.mightContainString(h))
    val hits = uniq.filter(col("doc_id") % 10 === 0)
      .select(md5(col("text")).as("h")).filter(might(col("h"))).count()
    assert(hits <= 20, s"bloom passed $hits of 200 all-new rows")
  }

  test("setSimJoinPrefix equals the unfiltered shared-shingle Jaccard join") {
    val docs = Tables(spark, sf()).documents
    val got = Dedup.setSimJoinPrefix(docs, "text", "doc_id", n = 3, threshold = 0.5)
      .orderBy("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // Naive reference: candidates = ALL pairs sharing any shingle hash.
    val sh = docs.select(col("doc_id").as("doc"),
      explode(array_distinct(
        graft.functions.TextHashFunctions.hashedShingles(col("text"), 3))).as("sh"))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val ref = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("da"), col("b.doc").as("db"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.withColumnRenamed("doc", "da").withColumnRenamed("sz", "sza"), "da")
      .join(sizes.withColumnRenamed("doc", "db").withColumnRenamed("sz", "szb"), "db")
      .withColumn("j", col("i") * lit(1.0) / (col("sza") + col("szb") - col("i")))
      .filter(col("j") >= 0.5)
      .select(col("da"), col("db"), round(col("j"), 6))
      .orderBy("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty)
    assert(got == ref)
  }

  test("setSimJoinPrefix with maxDf equals the capped naive join (q24 contract)") {
    val docs = Tables(spark, sf()).documents
    val cap = 20
    val got = Dedup.setSimJoinPrefix(docs, "text", "doc_id", n = 3,
        threshold = 0.5, maxDf = Some(cap))
      .orderBy("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // Capped naive reference: Jaccard over the df<=cap shingle sets.
    val shAll = docs.select(col("doc_id").as("doc"),
      explode(array_distinct(
        graft.functions.TextHashFunctions.hashedShingles(col("text"), 3))).as("sh"))
    val ok = shAll.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap).select("sh")
    val sh = shAll.join(ok, "sh")
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val ref = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("da"), col("b.doc").as("db"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.withColumnRenamed("doc", "da").withColumnRenamed("sz", "sza"), "da")
      .join(sizes.withColumnRenamed("doc", "db").withColumnRenamed("sz", "szb"), "db")
      .withColumn("j", col("i") * lit(1.0) / (col("sza") + col("szb") - col("i")))
      .filter(col("j") >= 0.5)
      .select(col("da"), col("db"), round(col("j"), 6))
      .orderBy("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty)
    assert(got == ref)
  }

  test("setSimJoinPrefix: awkward thresholds (t*n an ulp above an integer) lose no pairs") {
    import spark.implicits._
    // 10 distinct tokens per doc; pair (1,2) shares 6 of 10+10 distinct
    // => J = 6/14 ≈ 0.4286; pair (3,4) identical => J = 1.
    val mk = (ws: Seq[String]) => ws.mkString(" ")
    val docs = Seq(
      (1L, mk((1 to 10).map("w" + _))),
      (2L, mk((5 to 14).map("w" + _))),
      (3L, mk((20 to 29).map("w" + _))),
      (4L, mk((20 to 29).map("w" + _)))
    ).toDF("doc_id", "text")
    // n=1 unigram sets; t=0.3: 0.3*10 = 3.0000000000000004 in doubles —
    // a naive ceil would demand overlap 4 and shrink prefixes by one.
    val got = Dedup.setSimJoinPrefix(docs, "text", "doc_id", n = 1, threshold = 0.3)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L)))
  }

  test("setSimJoinPrefix refuses past its candidate bound, naming the scale path") {
    // the guard is an estimate GATE, not a semantics change: past the
    // bound the operator throws ContractRefusal (the 30x full-corpus run
    // died in spill without it); within the bound results are untouched
    // (the equality specs above run at the default bound)
    val ex = intercept[graft.util.ContractRefusal] {
      Dedup.setSimJoinPrefix(docs, "text", "doc_id", maxCandEstimate = 1L)
        .count()
    }
    assert(ex.getMessage.contains("minhashLshPairs"), ex.getMessage)
    assert(ex.getMessage.contains("estimated candidate volume"), ex.getMessage)
  }

  test("simhashPairs refuses past its band-collision bound, naming the scale path") {
    // same contract class as setSimJoinPrefix: exact pigeonhole banding
    // carries an ~n²/2^bandBits chance-collision term no fixed fingerprint
    // width outruns; past the bound the operator refuses loudly
    val ex = intercept[graft.util.ContractRefusal] {
      Dedup.simhashPairs(docs, "text", "doc_id", maxCandEstimate = 0L)
        .count()
    }
    assert(ex.getMessage.contains("minhashLshPairs"), ex.getMessage)
    assert(ex.getMessage.contains("band-bucket candidate volume"), ex.getMessage)
  }

  test("fuzzyPairs refuses past its block-candidate bound, naming sortedNeighborhood") {
    import spark.implicits._
    // two names sharing a (length, all-but-last-2 prefix) block
    val names = Seq((1L, "alpha-001"), (2L, "alpha-002"))
      .toDF("doc_id", "text")
    val ex = intercept[graft.util.ContractRefusal] {
      Dedup.fuzzyPairs(names, col("text"), col("doc_id"), maxDist = 2,
        maxCandEstimate = 0L).count()
    }
    assert(ex.getMessage.contains("sortedNeighborhood"), ex.getMessage)
    assert(ex.getMessage.contains("block candidate volume"), ex.getMessage)
  }

  test("embeddingNearDupPairs refuses past its pair bound, naming the scale paths") {
    val embs = Tables(spark, sf("sf0.001")).embeddings
    val ex = intercept[graft.util.ContractRefusal] {
      Dedup.embeddingNearDupPairs(embs, "embedding", "vec_id",
        threshold = 0.4, maxPairEstimate = 1L).count()
    }
    assert(ex.getMessage.contains("semanticDedupAuto"), ex.getMessage)
    assert(ex.getMessage.contains("all-pairs volume"), ex.getMessage)
  }

  test("lshIncrementalDedup equals the full exact batch-vs-corpus compare (q71)") {
    // The LSH index probe and the corpus-shingle-scan incremental dedup
    // share semantics exactly (corpus df cap, exact-Jaccard verify,
    // min-corpus-doc survivor); the probe only prunes the candidate space.
    // Equality on real data proves the index path loses nothing here —
    // the residual banding miss probability at j=0.5 is ~1e-4 per pair,
    // and the hash family is deterministic, so this comparison is stable.
    val isBatch = col("doc_id") % 10 === 0
    val viaIndex = Dedup.lshIncrementalDedup(docs, "text", "doc_id", isBatch)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(2))).toSet
    val viaScan = Dedup.incrementalDedup(docs, "text", "doc_id", isBatch)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(2))).toSet
    assert(viaIndex == viaScan)
    assert(viaIndex.exists(!_._3), "fixture should contain at least one dup")
    assert(viaIndex.exists(_._3), "fixture should contain at least one novel doc")
  }

  test("lshIncrementalDedup: planted near-copy is caught, novel doc is kept") {
    import spark.implicits._
    val corpusText = "the quick brown fox jumps over the lazy dog " * 4
    val rows = (1L to 9L).map(i => (i, corpusText + s" corpus marker $i")) :+
      (10L, corpusText + " corpus marker 3x") :+ // near-copy of corpus doc 3
      (20L, "completely novel content with its own vocabulary entirely " * 5)
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.lshIncrementalDedup(df, "text", "doc_id",
        isBatch = col("doc_id") >= 10L)
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), r.getBoolean(2)))).toMap
    assert(!got(10L)._2, "near-copy must be flagged")
    assert(got(20L) == (None, true), "novel doc must be kept")
  }

  test("sortedNeighborhood equals the naive global-rank window join") {
    import spark.implicits._
    // names whose typos share a SUFFIX (prefix blocking would miss them);
    // enough rows that the default first-char sharding crosses shards
    val names = (0 until 60).map(i => (i.toLong, f"acct-$i%04d")) ++
      Seq((100L, "bcct-0013"), (101L, "acct-9999"), (102L, "acct_0042"))
    val df = names.toDF("id", "nm")
    val sk = reverse(lower(col("nm")))
    val got = Dedup.sortedNeighborhood(df, col("nm"), col("id"),
        sortKey = sk, w = 3, maxDist = 1)
      .select("key_a", "key_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive: global rank via a single-partition window, all pairs within w
    val ranked = df.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(sk, col("id")))).select("id", "nm", "rnk")
    val naive = ranked.as("a").join(ranked.as("b"),
        col("b.rnk") > col("a.rnk") && col("b.rnk") <= col("a.rnk") + 3)
      .filter(levenshtein(col("a.nm"), col("b.nm")) <= 1)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
    // the suffix-typo pair (acct-0013, bcct-0013) is adjacent in reversed
    // order and must be found — the pair q75-style prefix blocking misses
    assert(got.exists { case (x, y) => Set(x, y) == Set(13L, 100L) })
  }

  test("sortedNeighborhood is partitioning-independent") {
    import spark.implicits._
    val df = (0 until 200).map(i => (i.toLong, f"n-${i * 7 % 1000}%04d")).toDF("id", "nm")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.sortedNeighborhood(d, col("nm"), col("id"),
          sortKey = reverse(col("nm")), w = 4, maxDist = 1)
        .orderBy("key_a", "key_b").collect().toSeq
    assert(run(df) == run(df.repartition(7)) && run(df).nonEmpty)
  }

  test("sourceOverlapMinhash: identical sources estimate 1, disjoint estimate 0") {
    import spark.implicits._
    val a = (0 until 30).map(i => (i.toLong, s"alpha beta gamma delta $i common tail", "sA"))
    val b = (0 until 30).map(i => (i.toLong + 100, s"alpha beta gamma delta $i common tail", "sB"))
    val c = (0 until 30).map(i => (i.toLong + 200, s"zeta eta theta iota kappa ${i + 777} lambda", "sC"))
    val docs = (a ++ b ++ c).toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlapMinhash(docs, "text", "source", n = 3, k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("est_jaccard")).toMap
    assert(got(("sA", "sB")) == 1.0, "identical shingle sets -> all mins equal")
    assert(got(("sA", "sC")) == 0.0 && got(("sB", "sC")) == 0.0,
      "disjoint shingle sets -> no min collides (w.h.p.)")
    assert(got.size == 3)
  }

  test("sourceOverlapMinhash estimate tracks exact Jaccard on the test corpus") {
    val got = Dedup.sourceOverlapMinhash(docs, "text", "source", n = 3, k = 16)
      .collect()
    assert(got.length > 0)
    // estimates are proper probabilities in k-th increments
    assert(got.forall { r =>
      val e = r.getAs[Double]("est_jaccard")
      e >= 0.0 && e <= 1.0 && (e * 16) == math.rint(e * 16)
    })
  }

  test("grouped LSH pairs equal the per-doc form (planted duplicate classes)") {
    import spark.implicits._
    // real corpus + planted exact-dup classes of sizes 2 and 15 (below the
    // df cap: shingles survive, J=1 pairs must appear) — copies reuse two
    // corpus texts so cross-class near-dup fan-out is exercised too
    val base = docs.select(col("doc_id"), col("text"))
    val two = base.orderBy("doc_id").limit(2).collect()
    val copies = (1 to 15).map(i => (100000L + i, two(0).getString(1))) ++
      (1 to 2).map(i => (200000L + i, two(1).getString(1)))
    val corpus = base.unionByName(copies.toDF("doc_id", "text"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet
    val grouped = pairs(Dedup.minhashLshPairs(corpus, "text", "doc_id"))
    val perDoc = pairs(Dedup.minhashLshPairsUngrouped(corpus, "text", "doc_id"))
    assert(grouped == perDoc,
      s"extra=${grouped diff perDoc} missing=${perDoc diff grouped}")
    // the 16-member class (15 copies + original) contributes C(16,2) J=1
    // intra pairs
    val cls1 = Set(two(0).getLong(0)) ++ (1 to 15).map(100000L + _)
    assert(grouped.count { case (a, b, j) =>
      cls1(a) && cls1(b) && j == 1.0 } == 16 * 15 / 2)
  }

  test("a df-capped boilerplate class costs no pair work and emits no pairs") {
    import spark.implicits._
    // 1000 identical copies: every shingle of the class has document
    // frequency 1000 > maxShingleDf, so the class's filtered set is empty
    // and BOTH forms emit nothing for it — but the grouped form pays ONE
    // doc's worth of hashing for the class instead of 1000 (and never
    // enumerates the ~500k intra pairs as candidates). Pairs among the
    // other docs are unaffected.
    val boiler = (1 to 1000) // private vocab: no df interference with docs
      .map(i => (500000L + i, (1 to 20).map(k => s"zqfooter$k").mkString(" ")))
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(boiler.toDF("doc_id", "text"))
    val got = Dedup.minhashLshPairs(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (a, b) => a < 500000L && b < 500000L },
      "the df-capped class must contribute no pairs")
    val without = Dedup.minhashLshPairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == without, "other docs' pairs are unaffected")
  }

  /** Ground-truth gate for the q129 overlap-seed family (the in-repo form
    * of the round-10 audit in the [[Dedup.overlapSeeds]] docstring): on
    * planted source pairs at EXACT shingle-set Jaccard 1/3, the k=16
    * estimator must be unbiased and Binomial-dispersed — an
    * argmin-correlated family (the round-10 MinHash bug) clusters
    * estimates at 0/1 instead and fails the dispersion band.
    */
  test("sourceOverlapMinhash estimator is unbiased and binomial-dispersed at planted J") {
    import spark.implicits._
    val nPairs = 60
    // per-pair private vocab: sources s<i>a / s<i>b share 300 of their
    // 600 distinct-shingle universes => set Jaccard exactly 1/3. One doc
    // per source; tokens chosen so 3-gram shingles are vocab-disjoint
    // across groups (each doc = one token stream).
    def stream(tag: String, i: Int, n: Int) =
      (0 until n).map(k => s"v$i${tag}t$k")
    val rows = (0 until nPairs).flatMap { i =>
      val shared = stream("s", i, 302) // 302 tokens -> 300 shingles
      val ua = stream("a", i, 302)
      val ub = stream("b", i, 302)
      // concatenating streams adds 2 bridge shingles per junction —
      // negligible (2/902) and identical on both sides of the pair
      Seq((s"s${i}a", (shared ++ ua).mkString(" ")),
          (s"s${i}b", (shared ++ ub).mkString(" ")))
    }
    val docs = rows.toDF("source", "text")
    val est = Dedup.sourceOverlapMinhash(docs, "text", "source", n = 3, k = 16)
      .collect()
      .filter(r => r.getString(0).dropRight(1) == r.getString(1).dropRight(1))
      .map(_.getAs[Double]("est_jaccard"))
    assert(est.length == nPairs)
    val mean = est.sum / est.length
    // set J is ~0.334 (300+2 bridge shingles of 902); binomial sd of the
    // MEAN over 60 pairs is ~0.015 — ±0.05 is a 3σ+ band
    assert(math.abs(mean - 1.0 / 3) <= 0.05, f"mean $mean%.4f")
    // dispersion: per-pair sd must look Binomial(16, J)/16 (~0.118), not
    // the 0/1 bimodal an argmin-correlated family produces (~0.47)
    val sd = math.sqrt(est.map(e => (e - mean) * (e - mean)).sum / est.length)
    assert(sd <= 0.25, f"sd $sd%.4f — estimator looks argmin-correlated")
    assert(est.count(e => e == 0.0 || e == 1.0) <= nPairs / 10,
      "estimates cluster at 0/1 — argmin correlation")
  }

  test("mulAddModP equals exact BigInt (a*h+b) mod p") {
    val p = BigInt(graft.functions.MinHashMod.P)
    val rnd = new scala.util.Random(7)
    def r61() = rnd.nextLong().abs % graft.functions.MinHashMod.P
    for (_ <- 1 to 20000) {
      val h = rnd.nextLong().abs % (1L << 48) // shingle hashes are 48-bit
      val a = r61() + 1
      val b = r61()
      val want = ((BigInt(a) * h + b) mod p).toLong
      val got = graft.functions.MinHashMod.mulAddModP(h, a, b)
      assert(got == want, s"h=$h a=$a b=$b")
    }
    // full-range h too (the fold is valid for any h < p)
    for (_ <- 1 to 20000) {
      val (h, a, b) = (r61(), r61() + 1, r61())
      assert(graft.functions.MinHashMod.mulAddModP(h, a, b) ==
        ((BigInt(a) * h + b) mod p).toLong)
    }
  }

  // Planted pairs at controlled exact Jaccard, disjoint per-pair vocab:
  // A = tokens [0, S+2), B = tokens [g, g+S+2) of the pair's private
  // stream => |A∩B| = S-g shingles, pair J = (S-g)/(S+g) exactly.
  private val recallLevels = Seq( // (J, S, g, literal pair-recall floor)
    (0.50, 30, 10, 0.55),
    (0.60, 32, 8, 0.85),
    (0.75, 28, 4, 0.99),
    (0.90, 38, 2, 0.995))
  private val recallPairs = 200

  private def plantedRecallDocs = {
    import spark.implicits._
    val rows = for {
      ((_, s, g, _), li) <- recallLevels.zipWithIndex
      i <- 0 until recallPairs
      side <- 0 to 1
    } yield {
      val from = if (side == 0) 0 else g
      val text = (from until from + s + 2).map(k => s"L${li}p${i}t$k").mkString(" ")
      ((li.toLong * recallPairs + i) * 2 + side, text)
    }
    rows.toDF("doc_id", "text")
  }

  /** The recall contract of the banding constants — referenced from the
    * [[Dedup.MinHashBands]] docstring. Any future (k, bands) retune must
    * show its recall price here in red/green: the fixed literal floors
    * encode the DOCUMENTED contract (t* = 0.50), and the ±tolerance band
    * around the analytic S-curve catches a hash family whose realized slot
    * agreement is not per-slot-J independent (the round-9 a ∈ [1, 2¹²]
    * family failed exactly this way: planted J = 0.9 pairs produced zero
    * band collisions because all no-wrap slots picked the same argmin).
    */
  test("LSH candidate recall tracks the banding S-curve") {
    val (levels, nPairs) = (recallLevels, recallPairs)
    val docs = plantedRecallDocs
    val found = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, threshold = 0.4)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.MinHashBands
    val r = Dedup.MinHashK / b
    for (((j, _, _, floor), li) <- levels.zipWithIndex) {
      val planted = (0 until nPairs)
        .map(i => ((li.toLong * nPairs + i) * 2, (li.toLong * nPairs + i) * 2 + 1))
      val recall = planted.count(found.contains).toDouble / nPairs
      val predicted = 1.0 - math.pow(1.0 - math.pow(j, r), b)
      assert(recall >= floor, f"J=$j: recall $recall%.3f below floor $floor")
      assert(math.abs(recall - predicted) <= 0.07,
        f"J=$j: recall $recall%.3f vs S-curve $predicted%.3f")
    }
    // disjoint vocab across pairs => nothing but planted pairs can match
    assert(found.forall { case (a2, b2) => b2 == a2 + 1 && a2 % 2 == 0 })
  }

  /** The probe-side recall contract (same planted corpus): corpus = the
    * even-id docs, batch = their odd-id partners probing the built index.
    * The batch doc's shingles OUTSIDE the corpus df universe drop (the
    * frozen-universe contract), so the effective probe Jaccard is
    * J' = (S−g)/S — HIGHER than the pair J — and recall must track the
    * S-curve at J'.
    */
  test("LSH index-probe recall tracks the banding S-curve") {
    import org.apache.spark.sql.functions._
    val docs = plantedRecallDocs
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val idx = Dedup.lshIndexBuild(corpus, "text", "doc_id")
    val dupOf = Dedup.lshIndexProbe(idx, batch, "text", "doc_id",
        threshold = 0.5)
      .filter(col("dup_of").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.MinHashBands
    val r = Dedup.MinHashK / b
    for (((j, s, g, _), li) <- recallLevels.zipWithIndex) {
      val hits = (0 until recallPairs).count { i =>
        val base = (li.toLong * recallPairs + i) * 2
        dupOf.get(base + 1).contains(base)
      }
      val recall = hits.toDouble / recallPairs
      val jProbe = (s - g).toDouble / s
      val predicted = 1.0 - math.pow(1.0 - math.pow(jProbe, r), b)
      assert(math.abs(recall - predicted) <= 0.07,
        f"pairJ=$j (probe J'=$jProbe%.3f): recall $recall%.3f vs S-curve $predicted%.3f")
      assert(recall >= 0.9, f"pairJ=$j: probe recall $recall%.3f")
    }
    // disjoint vocab: any resolved dup_of must be the planted partner
    assert(dupOf.forall { case (bd, cd) => cd == bd - 1 })
  }
}
