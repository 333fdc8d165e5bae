package graft.functions

import graft.{SparkSpec, Tables}
import graft.util.TextPrep._
import org.apache.spark.sql.functions._

class TextHashSpec extends SparkSpec {

  test("HashedShingles equals the composable HOF pipeline bit-for-bit") {
    val docs = Tables(spark, sf("sf0.001")).documents
    val viaHof = docs
      .withColumn("_toks", tokens(col("text")))
      .select(col("doc_id"),
        transform(shingles(col("_toks"), 3), s => h48(s)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaExpr = docs
      .select(col("doc_id"),
        TextHashFunctions.hashedShingles(col("text"), 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(viaHof.keySet == viaExpr.keySet)
    viaHof.foreach { case (id, hs) => assert(hs == viaExpr(id), s"doc $id") }
  }

  test("edge cases: empty text, fewer tokens than n") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "  one  "), (3L, "a b"), (4L, "a b c")).toDF("id", "text")
    val out = df.select(col("id"), TextHashFunctions.hashedShingles(col("text"), 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).length).toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1))
  }
}
