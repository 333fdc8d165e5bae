package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingIndexSpec extends SparkSpec {

  private def embs = graft.Tables(spark, sf()).embeddings
  private val isBatch = col("vec_id") % 10 === 0

  test("probe dedup: every dup_of is a true near-dup, and probe-scope recall is exact") {
    import graft.functions.VectorFunctions._
    val corpus = embs.filter(!isBatch)
    val cent = EmbeddingIndex.seedCentroids(corpus, "embedding", "vec_id", 16)
    val index = EmbeddingIndex.assignCells(corpus, cent, "embedding", "vec_id").cache()
    val got = EmbeddingIndex.probeDedup(index, cent, embs.filter(isBatch),
      "embedding", "vec_id").cache()

    // precision: each reported dup_of really has cos >= 0.4 with its batch vector
    val bad = got.filter(!col("is_new"))
      .join(embs.select(col("vec_id"), col("embedding").as("bv")), "vec_id")
      .join(embs.select(col("vec_id").as("dup_of"), col("embedding").as("cv")), "dup_of")
      .filter(cosineFast(col("bv"), col("cv")) < 0.4)
    assert(bad.count() == 0)

    // scope-exact recall (the q133 pattern): within the probed cells the
    // probe must find the MIN matching corpus id a full scan of those
    // cells finds — the IVF recall knob is cell routing, never the verify
    val probes = embs.filter(isBatch)
      .select(col("vec_id").as("bid"), col("embedding").as("qv"))
      .join(broadcast(cent))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bid"))
          .orderBy(cosineFast(col("qv"), col("cv")).desc, col("cid"))))
      .filter(col("rn") <= 2).select(col("bid"), col("qv"), col("cid").as("cell"))
    val want = index.join(probes, "cell")
      .filter(cosineFast(col("qv"), col("v")) >= 0.4)
      .groupBy(col("bid")).agg(min(col("vec_id")).as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotMap = got.filter(!col("is_new")).select("vec_id", "dup_of")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMap == want)
    index.unpersist(); got.unpersist()
  }

  test("retract equals a full rebuild of the survivors under the frozen quantizer") {
    val corpus = embs.filter(!isBatch)
    val cent = EmbeddingIndex.seedCentroids(corpus, "embedding", "vec_id", 16)
    val index = EmbeddingIndex.assignCells(corpus, cent, "embedding", "vec_id")
    val dropIds = corpus.filter(col("vec_id") % 7 === 0).select("vec_id")
    val shrunk = EmbeddingIndex.retract(index, dropIds)
    val rebuilt = EmbeddingIndex.assignCells(
      corpus.filter(col("vec_id") % 7 =!= 0), cent, "embedding", "vec_id")
    assert(shrunk.select("vec_id", "cell").except(
      rebuilt.select("vec_id", "cell")).count() == 0)
    assert(rebuilt.select("vec_id", "cell").except(
      shrunk.select("vec_id", "cell")).count() == 0)
    // and no retracted id can ever come back as dup_of
    val got = EmbeddingIndex.probeDedup(shrunk, cent, embs.filter(isBatch),
      "embedding", "vec_id")
    assert(got.join(dropIds.withColumnRenamed("vec_id", "dup_of"), "dup_of")
      .count() == 0)
  }
}
