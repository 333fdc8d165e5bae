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
}
