package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The argmax/argmin contract ([[ArgMax]]'s object doc): the expression
  * forms must agree BIT-FOR-BIT with the rescoring (join+aggregate) forms
  * on real data including ties and NaNs, the rescoring form's "no key
  * group may vanish" invariant is tripwired, and the expression plan is
  * the map-only shape the migration claims (no join, no aggregate).
  */
class ArgMaxSpec extends SparkSpec {

  import spark.implicits._

  private def embs = graft.Tables(spark, sf()).embeddings

  private def cent(n: Int): DataFrame =
    embs.orderBy(col("vec_id")).limit(n)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))

  test("expression argmax == rescoring argmax on the embedding corpus") {
    val c = cent(16)
    val vin = embs.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").as("v"))
    val viaRescore = vin.join(
        ArgMax.rescoreArgmax(vin, "vec_id", "v", c, "cv", "cid", "cell"),
        "vec_id")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = vin.select(col("vec_id"),
        ArgMax.argmaxCosine(ArgMax.cosModel(c, "cv", "cid"), col("v"))
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaRescore)
    assert(viaExpr.size == vin.count())
  }

  test("ties resolve to the smallest id; NaN orders greatest — both forms") {
    // two identical candidates (tie) + one NaN-scoring candidate (a NaN
    // component → NaN cosine, which must WIN under NaN-greatest; a ZERO
    // vector would instead hit ANSI DIVIDE_BY_ZERO in the DataFrame form
    // — embeddings are nonzero by data contract)
    val rows = Seq(
      (1L, Seq(1.0, 0.0)),   // the query: ties cands 10/11 at cos=1
      (2L, Seq(0.0, 1.0)))
    val cands = Seq(
      (10L, Seq(2.0, 0.0)), (11L, Seq(3.0, 0.0)),
      (12L, Seq(Double.NaN, 1.0)))
    val left = rows.toDF("vec_id", "v")
    val small = cands.toDF("cid", "cv")
    val exprOut = left.select(col("vec_id"),
        ArgMax.argmaxCosine(ArgMax.cosModel(small, "cv", "cid"), col("v"))
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rescoreOut = left.join(
        ArgMax.rescoreArgmax(left, "vec_id", "v", small, "cv", "cid", "cell"),
        "vec_id")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // NaN is greatest for BOTH queries (cand 12 scores NaN against any
    // vector), so 12 wins everywhere — the struct-max ordering
    assert(exprOut == Map(1L -> 12L, 2L -> 12L))
    assert(exprOut == rescoreOut)
    // with the NaN candidate removed, the tie (cands 10/11 at cos=1.0 for
    // query 1) resolves to the SMALLEST id
    val noNaN = cands.take(2).toDF("cid", "cv")
    val tied = left.filter(col("vec_id") === 1L).select(col("vec_id"),
        ArgMax.argmaxCosine(ArgMax.cosModel(noNaN, "cv", "cid"), col("v"))
          .as("cell")).head().getLong(1)
    assert(tied == 10L)
  }

  test("keyed expression argmin (L2) == rescoring argmin over PQ slices") {
    val m = 8; val dim = 64; val sub = dim / m
    val corpus = embs.limit(500)
    val cb = Similarity.pqCodebooks(corpus, "embedding", "vec_id", m,
      k = 8, iters = 1)
    val slices = corpus.select(col("vec_id").cast("long").as("vec_id"),
        explode(array((0 until m).map(j =>
          struct(lit(j).as("j"),
            slice(col("embedding"), j * sub + 1, sub).cast("array<double>")
              .as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("s.j").as("j"), col("s.sv").as("sv"))
    import graft.functions.VectorFunctions._
    val d2 = dotd(col("sv"), col("sv")) -
      lit(2.0) * dotd(col("sv"), col("cv")) + dotd(col("cv"), col("cv"))
    val viaRescore = ArgMax.rescoreArgmin(slices, Seq("vec_id", "j"), cb,
        Seq("j"), d2, "code", "code")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val viaExpr = slices.select(col("vec_id"), col("j"),
        ArgMax.argminL2(ArgMax.l2Model(cb, "cv", "code", Some("j")),
          col("sv"), key = col("j")).cast("int").as("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(viaExpr == viaRescore)
    // and the FUSED per-vector form agrees with the sliced form
    val fused = Similarity.pqEncode(corpus, "embedding", "vec_id", cb)
      .select(col("vec_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val reassembled = viaExpr.groupBy(_._1._1).map { case (v, kv) =>
      v -> kv.toList.sortBy(_._1._2).map(_._2)
    }
    assert(fused == reassembled)
  }

  test("rescoring-form tripwire: output cardinality == distinct key count") {
    // the 'no key group may vanish' invariant (ArgMax object doc): with a
    // deterministic score both aggregate and filter branches see the same
    // bits, so every input key must appear exactly once in the output
    val c = cent(16)
    val vin = embs.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").as("v"))
    val out = ArgMax.rescoreArgmax(vin, "vec_id", "v", c, "cv", "cid", "x")
    assert(out.count() == vin.select("vec_id").distinct().count())
    assert(out.groupBy("vec_id").count().filter(col("count") > 1).isEmpty)
  }

  test("hier two-level routing: expression form matches the recomputed two-stage reference") {
    // reference: flat argmax to the coarse model, then flat argmax within
    // the chosen coarse cell's children — computed with the DataFrame
    // forms stage by stage
    val c = cent(16)
    val centRows = c.select(col("cid").cast("long"),
        col("cv").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val nCoarse = math.ceil(math.sqrt(centRows.length.toDouble)).toInt
    val coarse = centRows.take(nCoarse)
    val coarseDf = c.orderBy(col("cid")).limit(nCoarse)
      .select(col("cid").as("gid"), col("cv").as("gv"))
    val vin = embs.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").as("v"))
    // stage 1 reference (rescoring form)
    val vg = vin.join(ArgMax.rescoreArgmax(vin, "vec_id", "v", coarseDf,
      "gv", "gid", "gid"), "vec_id")
    // childOf reference (rescoring form, model × model)
    val childBest = ArgMax.rescoreArgmax(c, "cid", "cv", coarseDf, "gv",
      "gid", "_g")
    val childOf = c.join(childBest, "cid")
      .select(col("cid"), col("_g").as("gid"), col("cv"))
    val ref = vin.join(ArgMax.rescoreArgmax(vg, "vec_id", "v", childOf,
        "cv", "cid", "cell", candKey = Some("gid")), "vec_id")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = EmbeddingIndex.assignCellsHier(embs, c, "embedding", "vec_id")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
    // driver-side childOf replica matches the DataFrame computation
    val childDriver = centRows.map { case (cid, cv) =>
      cid -> ArgMax.argmaxCosineDriver(coarse, cv)
    }.toMap
    val childDf = childOf.select(col("cid").cast("long"),
        col("gid").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(childDriver == childDf)
  }

  test("expression argmax plans map-only: no join, no aggregate, inside codegen") {
    val c = cent(16)
    val df = embs.select(col("vec_id"),
      ArgMax.argmaxCosine(ArgMax.cosModel(c, "cv", "cid"),
        col("embedding")).as("cell"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(1000))
    assert(!p.contains("Aggregate"), p.take(1000))
    // "*(n)" is the whole-stage-codegen stage marker in the tree print
    assert(p.contains("*("), p.take(1000))
  }
  test("codegen'd ADC sum == composed HOF fold, bit for bit") {
    val m = 8
    val corpus = embs.limit(300)
    val cb = Similarity.pqCodebooks(corpus, "embedding", "vec_id", m,
      k = 8, iters = 1)
    val idxDf = Similarity.pqEncode(corpus, "embedding", "vec_id", cb)
    // a deterministic fake pd table: pd[j][code] = j + code / 100.0
    val pdLit = typedlit((0 until m).map(j =>
      (0 until 8).map(c => j + c / 100.0)))
    val hof = idxDf.withColumn("pd", pdLit)
      .select(col("vec_id"), aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
          (c, j) => element_at(element_at(col("pd"), j + 1), c + 1)),
        lit(0.0), (acc, x) => acc + x).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fused = idxDf.withColumn("pd", pdLit)
      .select(col("vec_id"), org.apache.spark.sql.GraftInterop.column(
        graft.functions.AdcSum(
          org.apache.spark.sql.GraftInterop.expression(col("codes")),
          org.apache.spark.sql.GraftInterop.expression(col("pd")))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused == hof)
  }
}
