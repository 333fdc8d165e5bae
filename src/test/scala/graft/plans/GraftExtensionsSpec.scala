package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  private lazy val embs = Tables(spark, sf("sf0.001")).embeddings.cache()

  test("graft_dot is registered as a SQL function") {
    embs.createOrReplaceTempView("emb_ext")
    val r = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS d FROM emb_ext ORDER BY vec_id LIMIT 5")
      .collect()
    assert(r.length == 5 && r.forall(_.getDouble(1) > 0))
  }

  test("graft_simhash48 and graft_hashed_shingles are SQL-callable") {
    Tables(spark, sf("sf0.001")).documents.createOrReplaceTempView("docs_ext")
    val r = spark.sql("""
      SELECT doc_id, graft_simhash48(text) AS sh,
             size(graft_hashed_shingles(text, 3)) AS n_sh
      FROM docs_ext ORDER BY doc_id LIMIT 3""").collect()
    assert(r.length == 3 && r.forall(x => x.getLong(1) > 0 && x.getInt(2) > 0))
  }

  test("graft_cosine, graft_minhash_sig and graft_hyperplane_buckets are SQL-callable") {
    embs.createOrReplaceTempView("emb_ext2")
    val cos = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM emb_ext2 LIMIT 3").collect()
    cos.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
    // SQL bucket ids must equal the operator path's fused expression output
    val sqlBuckets = spark.sql(
      """SELECT vec_id, graft_hyperplane_buckets(embedding, 24, 4, 64) AS b
         FROM emb_ext2 ORDER BY vec_id LIMIT 5""").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val opBuckets = embs.orderBy("vec_id").limit(5)
      .select(col("vec_id"), graft.functions.VectorFunctions.hyperplaneBuckets(
        col("embedding"), graft.operators.Similarity.hyperplanes(24, 4, 64)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sqlBuckets == opBuckets)
    Tables(spark, sf("sf0.001")).documents.createOrReplaceTempView("docs_ext2")
    val sig = spark.sql("""
      SELECT size(graft_minhash_sig(graft_hashed_shingles(text, 3))) AS k
      FROM docs_ext2 WHERE length(text) > 50 LIMIT 3""").collect()
    sig.foreach(r => assert(r.getInt(0) == 64))
  }

  test("optimizer fuses the HOF dot-product idiom into graft_dot") {
    // written in the composable HOF form...
    val hof = embs.select(col("vec_id"),
      graft.operators.Dedup.cosine(col("embedding"), col("embedding")).as("c"))
    // ...the optimized plan must contain the fused native expression
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), optimized)
    assert(!optimized.contains("aggregate(zip_with"), optimized)
    // and values must be exactly the cosine of a vector with itself ≈ 1
    hof.collect().foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }

  test("rewrite does NOT fire on a bare-float multiply (different rounding)") {
    // aggregate(zip_with(a, b, (x, y) -> x * y), 0D, ...) over array<float>
    // WITHOUT casting x/y to double multiplies in FLOAT precision; the fused
    // loop promotes per element, so rewriting would change results. The rule
    // must leave this shape alone.
    embs.createOrReplaceTempView("emb_guard")
    val df = spark.sql("""
      SELECT vec_id,
             aggregate(zip_with(embedding, embedding, (x, y) -> x * y),
                       0D, (acc, v) -> acc + v) AS d
      FROM emb_guard ORDER BY vec_id LIMIT 5""")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"), optimized)
    // and the engine's own cosine idiom (which casts) still fuses
    val fused = embs.select(
      graft.operators.Dedup.cosine(col("embedding"), col("embedding")))
      .queryExecution.optimizedPlan.toString
    assert(fused.contains("graft_dot"), fused)
  }

  test("fused and unfused paths agree bit-for-bit") {
    val a = Tables(spark, sf("sf0.001")).embeddings.limit(50)
      .select(col("vec_id"), col("embedding"))
    val pairs = a.as("x").crossJoin(a.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
    val viaHof = pairs.select(col("x.vec_id"), col("y.vec_id"),
      graft.operators.Dedup.cosine(col("x.embedding"), col("y.embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaExpr = pairs.select(col("x.vec_id"), col("y.vec_id"),
      graft.functions.VectorFunctions.cosineFast(col("x.embedding"), col("y.embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    viaHof.foreach { case (k, v) => assert(v == viaExpr(k), k) }
  }
}
