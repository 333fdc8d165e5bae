package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf("sf0.001")).documents.cache()

  test("mergedDuplicateSpans: islands cover exactly the flagged windows") {
    import spark.implicits._
    // Hand corpus: docs 1 and 2 share tokens 1..12 (three overlapping
    // 10-windows in each -> one island of [1, 12]); doc 3 is unique.
    val rep = (1 to 12).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, rep + " unique1 a b c d e f g h"),
      (2L, rep + " unique2 p q r s t u v x"),
      (3L, (1 to 25).map(i => s"only$i").mkString(" "))
    ).toDF("doc_id", "text")
    val merged = Curation.mergedDuplicateSpans(d, "text", "doc_id")
      .orderBy("doc_id", "start_pos").collect()
    // doc 1 holds the first occurrence of every shared window; only doc 2
    // gets a removal island: windows at pos 1..3 merge to [1, 12].
    assert(merged.length == 1)
    val r = merged.head
    assert(r.getAs[Long]("doc_id") == 2L)
    assert(r.getAs[Int]("start_pos") == 1)
    assert(r.getAs[Int]("end_tok") == 12)
    assert(r.getAs[Long]("n_windows") == 3L)
  }

  test("mergedDuplicateSpans: disjoint duplicate regions stay separate islands") {
    import spark.implicits._
    val repA = (1 to 10).map(i => s"a$i").mkString(" ")
    val repB = (1 to 10).map(i => s"b$i").mkString(" ")
    val gap = (1 to 15).map(i => s"g$i").mkString(" ")
    val d = Seq(
      (1L, s"$repA x y z"), (2L, s"$repB x y z"),
      (3L, s"$repA $gap $repB")
    ).toDF("doc_id", "text")
    val merged = Curation.mergedDuplicateSpans(d, "text", "doc_id")
      .filter(col("doc_id") === 3L).orderBy("start_pos").collect()
    assert(merged.length == 2)
    assert(merged(0).getAs[Int]("start_pos") == 1)
    assert(merged(0).getAs[Int]("end_tok") == 10)
    assert(merged(1).getAs[Int]("start_pos") == 26)
    assert(merged(1).getAs[Int]("end_tok") == 35)
  }

  test("epochShuffle: dense per-epoch permutation, partition-count independent") {
    val a = Curation.epochShuffle(docs, "doc_id", Seq(0, 1), nShards = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = Curation.epochShuffle(docs, "doc_id", Seq(0, 1), nShards = 11)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a == b, "global_idx must not depend on shard count")
    val n = docs.count()
    for (e <- Seq(0, 1)) {
      val idxs = a.collect { case ((_, ep), i) if ep == e => i }.toSeq.sorted
      assert(idxs == (0L until n), s"epoch $e must be a dense 0..n-1 order")
    }
    // The two epochs are different permutations (that is the point).
    val ord0 = a.toSeq.collect { case ((d, 0), i) => d -> i }.sortBy(_._2).map(_._1)
    val ord1 = a.toSeq.collect { case ((d, 1), i) => d -> i }.sortBy(_._2).map(_._1)
    assert(ord0 != ord1)
  }

  test("domainCap: salted two-phase equals the naive single window") {
    val two = Curation.domainCap(docs, "source", col("n_chars"), "doc_id", n = 7)
      .select("source", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    val naive = docs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .select("source", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(two == naive)
  }

  test("mixAllocation: rate caps at 1 and epochs can exceed it") {
    val w = (substring(col("source"), 4, 10).cast("int") % 4 + 1) / lit(50.0)
    val rows = Curation.mixAllocation(docs, "text", "source", w, 50000L)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      val epochs = r.getAs[Double]("epochs")
      val toks = r.getAs[Long]("toks")
      val exp = r.getAs[Long]("exp_toks")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(math.min(1.0, epochs) - rate) < 1e-5)
      // expected tokens never exceed what the source actually has
      assert(exp <= toks)
    }
    // with these weights at least one source needs > 1 epoch of repeats
    assert(rows.exists(_.getAs[Double]("epochs") > 1.0))
  }

  test("mixAllocationBpe: budgets in trained-tokenizer tokens, consistent with the q165 encode") {
    // Two sources with identical WHITESPACE token counts but different
    // compressibility under the corpus-trained tokenizer: src1's words are
    // repeated bigram-heavy strings (few BPE tokens after the merges),
    // src2's are hostile to every trained merge. Whitespace budgeting
    // cannot tell them apart; BPE budgeting must.
    import spark.implicits._
    val d = (1 to 8).map(i =>
        (i.toLong, "src1", "ababab ababab ababab ababab")) ++
      (9 to 16).map(i =>
        (i.toLong, "src2", "xq zv pk mw")) // no repeated pair anywhere
    val docs = d.toDF("doc_id", "source", "text")
    val alloc = Curation.mixAllocationBpe(docs, "text", "source",
        lit(0.5), budget = 100L, rounds = 4)
      .orderBy("source").collect()
    assert(alloc.length == 2)
    val toks = alloc.map(r => r.getString(0) -> r.getLong(2)).toMap
    // consistency with the encode frame the oracle replays: per-source
    // sums of bpeEncodeCounts equal the allocation's toks
    val enc = TextAnalysis.bpeEncodeCounts(docs, "text", "doc_id", rounds = 4)
      .join(docs.select(col("doc_id").as("doc"), col("source")), "doc")
      .groupBy("source").agg(sum("bpe_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks == enc, s"$toks vs $enc")
    // the trained merges compress src1 below src2 (same whitespace count:
    // 4 words/doc each), so src1's epochs/rate come out HIGHER per weight
    assert(toks("src1") < toks("src2"), toks.toString)
    val epochs = alloc.map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(epochs("src1") > epochs("src2"), epochs.toString)
  }

  test("mixMaterialize: copies bracket epochs exactly, deterministic under repartition") {
    val w = (substring(col("source"), 4, 10).cast("int") % 4 + 1) / lit(50.0)
    val out = Curation.mixMaterialize(docs, "text", "source", "doc_id", w, 50000L)
    val alloc = Curation.mixAllocation(docs, "text", "source", w, 50000L)
      .select("source", "n_docs", "epochs")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val bySource = out.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((s, (nDocs, e)) <- alloc) {
      val n = bySource.getOrElse(s, 0L)
      // every doc contributes floor(e) certain copies plus a coin copy
      assert(n >= math.floor(e).toLong * nDocs, s"$s under floor")
      assert(n <= math.ceil(e).toLong * nDocs, s"$s over ceil")
      // the coin is fair to ~sampling noise on 25 docs
      assert(math.abs(n - e * nDocs) <= nDocs * 0.35 + 2, s"$s: n=$n e=$e")
    }
    // deterministic: a different partitioning yields the identical multiset
    val a = out.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val b = Curation.mixMaterialize(docs.repartition(13), "text", "source",
        "doc_id", w, 50000L)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(a == b)
  }

  test("mixMaterialize: a zero-weight source vanishes (no descending-sequence leak)") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d", "keep"), (2L, "e f g h", "keep"),
      (3L, "i j k l", "drop"), (4L, "m n o p", "drop")
    ).toDF("doc_id", "text", "source")
    val w = when(col("source") === "keep", 1.0).otherwise(0.0)
    val out = Curation.mixMaterialize(d, "text", "source", "doc_id", w, 8L)
      .collect()
    assert(out.forall(_.getString(1) == "keep"), "zero-weight source leaked")
    assert(out.forall(_.getInt(2) >= 0), "negative copy_idx leaked")
    assert(out.nonEmpty)
  }

  test("curationPipeline: caps hold, order is dense, stages compose") {
    val out = Curation.curationPipeline(docs, "text", "doc_id", "source",
        col("n_chars"), capN = 7, maxOov = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // no source exceeds its cap
    val bySource = out.groupBy(_._2).view.mapValues(_.length)
    assert(bySource.forall(_._2 <= 7), bySource.toMap.toString)
    // the training order is a dense 0..n-1 permutation
    assert(out.map(_._4).sorted.toSeq == (0L until out.length))
    // deterministic under repartitioning
    val again = Curation.curationPipeline(docs.repartition(13), "text",
        "doc_id", "source", col("n_chars"), capN = 7, maxOov = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == again.toSet)
  }

  test("qualityBuckets: every doc lands in exactly one bucket, head scores highest") {
    val b = Curation.qualityBuckets(docs, "text", "doc_id", "source")
    val total = b.agg(sum("n_docs")).collect().head.getLong(0)
    assert(total == docs.count())
    val byBucket = b.groupBy("bucket")
      .agg(sum("n_docs").as("n"),
        (sum(col("avg_commonness") * col("n_docs")) / sum("n_docs")).as("avg"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket("head")._2 > byBucket("middle")._2)
    assert(byBucket("middle")._2 > byBucket("tail")._2)
    // quartile split: head ~ top 25%, tail ~ bottom 25% of 500 docs
    assert(byBucket("head")._1 >= 100 && byBucket("head")._1 <= 150)
    assert(byBucket("tail")._1 >= 100 && byBucket("tail")._1 <= 150)
  }

  test("qualityBuckets: approx-threshold scale config splits within sketch tolerance") {
    val approx = Curation.qualityBuckets(docs, "text", "doc_id", "source",
        approxThresholds = true)
      .groupBy("bucket").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.values.sum == docs.count())
    // at accuracy=10000 on 500 docs the sketch is effectively exact
    assert(approx("head") >= 100 && approx("head") <= 150)
    assert(approx("tail") >= 100 && approx("tail") <= 150)
  }

  test("dsirWeights: on-target vocabulary scores above off-target") {
    import spark.implicits._
    // Target docs speak vocabulary A, the raw pool vocabulary B. Among
    // three EQUAL-LENGTH raw docs (weights are per-token log-ratio SUMS,
    // so length is part of the score — the paper's semantics), pure A must
    // outscore the 3/2 mix, which must outscore pure B.
    val a = "alpha beta gamma delta epsilon"
    val b = "zulu yankee xray whiskey victor"
    val d = (Seq.tabulate(8)(i => (i.toLong, a, true)) ++ Seq(
      (100L, a, false), (101L, "alpha beta gamma zulu yankee", false),
      (102L, b, false)))
      .toDF("doc_id", "text", "tgt")
    val w = Curation.dsirWeights(d, "text", "doc_id", isTarget = col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(100L) > w(101L) && w(101L) > w(102L))
  }

  test("dsirWeights matches a sequential reference implementation exactly") {
    import spark.implicits._
    val rows = Seq(
      (1L, "spark scales out with partitions", true),
      (2L, "partitions shuffle data across executors", true),
      (3L, "ducks swim on the quiet pond", false),
      (4L, "spark partitions beat the pond ducks", false))
    val d = rows.toDF("doc_id", "text", "tgt")
    // engine-independent reference: same h48 features, α=1 smoothing,
    // per-feature micro-nat rounding, exact integer sum
    val nF = 1024
    def feats(t: String): Seq[Int] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      t.trim.toLowerCase.split(" +").toSeq.map { tok =>
        val hex = md.digest(tok.getBytes("UTF-8")).take(6)
          .map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(hex, 16) % nF).toInt
      }
    }
    val all = rows.flatMap { case (_, t, tgt) => feats(t).map(_ -> tgt) }
    val tf = all.filter(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rf = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (tTot, rTot) = (tf.values.sum, rf.values.sum)
    def lam(f: Int): Long =
      math.round(math.log(
        ((tf.getOrElse(f, 0L) + 1L) * (rTot + nF)).toDouble /
        ((rf(f) + 1L) * (tTot + nF)).toDouble) * 1e6)
    val expected = rows.map { case (id, t, _) => id -> feats(t).map(lam).sum }.toMap
    val got = Curation.dsirWeights(d, "text", "doc_id", isTarget = col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // exact integer weights are partitioning-independent by construction
    val re = Curation.dsirWeights(d.repartition(7), "text", "doc_id",
      isTarget = col("tgt")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == expected)
  }
}
