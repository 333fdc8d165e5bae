package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB engine needs both:
  *  - [[topKBruteForce]]: exact k-NN. The candidate set is `queries ×
  *    corpus` with the (small) query side broadcast, so the corpus is
  *    scanned once with no shuffle of the vectors; top-k is taken in TWO
  *    phases — a salted per-(query, salt) partial top-k, then the final
  *    per-query top-k over `k × nSalts` survivors — so no single reducer
  *    ever sees a whole query's candidate list (the naive
  *    `Window.partitionBy(query)` plan creates one giant partition per
  *    query at scale).
  *  - [[annLsh]]: random-hyperplane LSH (multiple tables). Candidates =
  *    vectors sharing a bucket with the query in ≥1 table; cost is a join
  *    on (table, bucket) — sublinear probing at the price of recall < 1.
  *    The DedupSpec-style recall harness lives in SimilaritySpec.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes (LCG), values in [-1, 1). */
  private[operators] def hyperplanes(tables: Int, planes: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    var s = 0x2545F4914F6CDD1DL
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Seq.fill(tables)(Seq.fill(planes)(Seq.fill(dim)(next())))
  }

  private def dotWithConst(v: Column, plane: Seq[Double]): Column =
    aggregate(
      zip_with(v, typedlit(plane), (x, w) => x.cast("double") * w),
      lit(0.0), (acc, x) => acc + x)

  /** LSH bucket id of a vector in one table: sign bits of `planes` dots. */
  private def bucketId(v: Column, tablePlanes: Seq[Seq[Double]]): Column =
    tablePlanes.zipWithIndex.map { case (p, i) =>
      when(dotWithConst(v, p) >= 0, 1L << i).otherwise(0L)
    }.reduce(_ + _)

  /** Exact top-k cosine neighbors for each query vector. */
  def topKBruteForce(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, k: Int, nSalts: Int = 16): DataFrame = {
    import graft.functions.VectorFunctions._
    val c = corpus.select(col(idCol).as("vec_id"), toDense(col(vecCol)).as("v"))
      .withColumn("vn", norm2(col("v")))
    val q = queries.select(col(idCol).as("query_id"), toDense(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dotd(col("qv"), col("v")) / (col("qn") * col("vn"))).as("cos"))
    // Phase 1: salted partial top-k (bounds any single partition's work).
    val salted = scored.withColumn("salt", pmod(crc32(col("vec_id").cast("string")), lit(nSalts)))
    val w1 = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("cos").desc, col("vec_id"))
    val partial = salted.withColumn("rn", row_number().over(w1)).filter(col("rn") <= k)
    // Phase 2: exact top-k over k × nSalts survivors per query.
    val w2 = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    partial.withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Approximate top-k via multi-table hyperplane LSH. */
  def annLsh(corpus: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
             k: Int, tables: Int = 8, planes: Int = 6, dim: Int = 64): DataFrame = {
    val hp = hyperplanes(tables, planes, dim)
    def withBuckets(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(s"${id}_v"),
        explode(array(hp.zipWithIndex.map { case (tp, t) =>
          struct(lit(t).as("t"), bucketId(col(vecCol), tp).as("b"))
        }: _*)).as("tb"))
        .select(col(id), col(s"${id}_v"), col("tb.t"), col("tb.b"))
    val cb = withBuckets(corpus, "vec_id")
    val qb = withBuckets(queries, "query_id")
    val candidates = cb.join(broadcast(qb), Seq("t", "b"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("query_id_v"), col("vec_id"), col("vec_id_v"))
      .distinct()
    val scored = candidates.select(col("query_id"), col("vec_id"),
      graft.functions.VectorFunctions.cosineFast(
        graft.functions.VectorFunctions.toDense(col("query_id_v")),
        graft.functions.VectorFunctions.toDense(col("vec_id_v"))).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  // ------------------------------------------------------------ query corpus

  val queries: Seq[Query] = Seq(

    // Exact k-NN for every 100th vector (deterministic query set).
    Query(
      "q33_ann_bruteforce",
      Some("""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                   WHERE vec_id % 100 = 0),
        scored AS (SELECT query_id, e.vec_id,
                     list_cosine_similarity(qv::DOUBLE[], e.embedding::DOUBLE[]) AS cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY list_cosine_similarity(qv::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id) AS rank
                   FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
        SELECT query_id, rank, vec_id, round(cos, 6) AS cos_sim
        FROM scored WHERE rank <= 5
        ORDER BY query_id, rank"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val qs = t.embeddings.filter(col("vec_id") % 100 === 0)
      topKBruteForce(t.embeddings, qs, "embedding", "vec_id", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed ANN: engine-specific recall → rows-only check; recall
    // measured against q33 in SimilaritySpec.
    Query("q34_ann_lsh", None)((spark, dir) => {
      val t = Tables(spark, dir)
      val qs = t.embeddings.filter(col("vec_id") % 100 === 0)
      annLsh(t.embeddings, qs, "embedding", "vec_id", k = 5)
        .orderBy(col("query_id"), col("rank"))
    })
  )
}
