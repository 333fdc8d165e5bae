package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("tfIdfKeywords: rare repeated tokens outrank ubiquitous ones") {
    import spark.implicits._
    // 'filler' appears in every doc (df=N -> idf_micro ~ 0); each doc's
    // distinctive token repeats twice and must rank first.
    val docs = Seq(
      (1L, "filler apple apple filler filler"),
      (2L, "filler banana banana filler filler"),
      (3L, "filler cherry cherry filler date")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfKeywords(docs, "text", "doc_id", topK = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"),
        r.getAs[String]("token")))
    assert(got.filter(_._2 == 1).map(t => t._1 -> t._3).toSeq ==
      Seq(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    // df=N token: idf_micro = round(ln((N+1)/(N+1))*1e6) = 0 exactly, so a
    // 'filler' score can never exceed any positive-idf token's
    val fillerScores = TextAnalysis.tfIdfKeywords(docs, "text", "doc_id", topK = 10)
      .filter(col("token") === "filler").select("score_micro")
      .collect().map(_.getLong(0))
    assert(fillerScores.nonEmpty && fillerScores.forall(_ == 0L))
  }

  test("tfIdfKeywords: exact integer score = tf * idf_micro") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x y"),
      (2L, "y z")).toDF("doc_id", "text")
    // N=2; df(x)=1 -> idf=ln(3/2); df(y)=2 -> idf=ln(1)=0; df(z)=1
    val idfMicro = math.round(math.log(3.0 / 2.0) * 1e6)
    val got = TextAnalysis.tfIdfKeywords(docs, "text", "doc_id", topK = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("token"), r.getAs[Long]("tf"),
          r.getAs[Long]("score_micro")))).toMap
    assert(got(1L) == (("x", 3L, 3L * idfMicro)))
    assert(got(2L) == (("z", 1L, idfMicro)))
  }

  test("tfIdfKeywords is partitioning-independent") {
    import spark.implicits._
    val docs = (0 until 100).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 11} tok${i % 13} shared words here"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.tfIdfKeywords(d, "text", "doc_id", topK = 3)
        .orderBy("doc_id", "rank").collect().toSeq
    val a = run(docs)
    assert(a == run(docs.repartition(9)) && a.nonEmpty)
  }

  test("bpeTrainMerges: hand-traced rounds — greedy apply, weighting, tie-break") {
    import spark.implicits._
    // word types: aab ×3, ab ×1, aaa ×1; 'b' (len 1) and 'x!y' (non-alnum)
    // are excluded from training.
    val docs = Seq(
      (1L, "aab aab ab"),
      (2L, "aab b x!y"),
      (3L, "aaa")).toDF("doc_id", "text")
    // round 1: pairs (a,a)=3+2=5 > (a,b)=3+1=4 → merge (a,a), cnt 5.
    //   GREEDY left-to-right: aaa → [aa, a] (not [a, aa]); aab → [aa, b].
    // round 2: (aa,b)=3, (aa,a)=1, (a,b)=1 → merge (aa,b), cnt 3.
    // round 3: (aa,a)=1 ties (a,b)=1 → encoded-pair ASC picks "|aa||a|"
    //   ('a' < '|' bytewise), display "aa a", cnt 1.
    val got = TextAnalysis.bpeTrainMerges(docs, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "a a", 5L), (2, "aa b", 3L), (3, "aa a", 1L)), got)
  }

  test("bpeTrainMerges stops early when the corpus runs out of pairs") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // round 1 merges (a,b); every word is then a single symbol — no pair
    // exists for round 2 and the loop must stop, not throw or emit nulls
    val got = TextAnalysis.bpeTrainMerges(docs, "text", rounds = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "a b", 2L)), got)
  }

  test("bpeEncodeCounts: hand-traced encode under the trained merges") {
    import spark.implicits._
    // Same corpus as the hand-traced trainer; 3 rounds train
    //   (a,a) → (aa,b) → (aa,a).
    // Encode per word:  aab → |aab| = 1 symbol; ab → |a||b| = 2 (the
    // (a,b) pair never trained); aaa → |aa||a| → merge 3 → |aaa| = 1;
    // b → |b| = 1 (len-1 words encode even though they never train);
    // x!y → atomic |_| = 1.
    val docs = Seq(
      (1L, "aab aab ab"),   // 1 + 1 + 2 = 4
      (2L, "aab b x!y"),    // 1 + 1 + 1 = 3
      (3L, "aaa")).toDF("doc_id", "text") // 1
    val got = TextAnalysis.bpeEncodeCounts(docs, "text", "doc_id", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 4L, 2L -> 3L, 3L -> 1L), got.toString)
    // merges cannot cross word boundaries: "a b" never becomes "ab"
    val boundary = Seq((1L, "ab ab a b")).toDF("doc_id", "text")
    val b = TextAnalysis.bpeEncodeCounts(boundary, "text", "doc_id",
      rounds = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // trained merge (a,b): ab→1 each; standalone a→1, b→1 (separate words)
    assert(b == Map(1L -> 4L), b.toString)
  }
}
