package graft.functions

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {

  private lazy val embs = Tables(spark, sf("sf0.001")).embeddings.cache()

  test("codegen dot product equals the higher-order-function fold bit-for-bit") {
    val hof = embs.select(col("vec_id"),
      graft.operators.Dedup.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fast = embs.select(col("vec_id"),
      cosineFast(toDense(col("embedding")), toDense(col("embedding"))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    hof.foreach { case (id, v) => assert(v == fast(id), s"vec $id: $v != ${fast(id)}") }
  }

  test("dot product participates in whole-stage codegen") {
    val df = embs.select(dotd(toDense(col("embedding")), toDense(col("embedding"))).as("d"))
      .filter(col("d") > 0)
    // the `*(n)` prefix on Project/Filter marks whole-stage-codegen'd nodes
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot") || plan.contains("*(1) Filter (graft_dot"), plan)
    // sanity: values are finite and positive for dense random vectors
    assert(df.count() == embs.count())
  }

  test("null vector yields null; mismatched lengths yield null (zip_with parity)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),
      (2L, Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), dotd(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(11.0))
    // Same result as the HOF form, where zip_with null-pads the shorter
    // array and the aggregate goes null — not a silent partial sum.
    assert(out(2L).isEmpty)
    val withNull = df.withColumn("c", when(col("id") === 1, col("a")))
      .select(dotd(col("c"), col("b")).as("d")).collect()
    assert(withNull.count(_.isNullAt(0)) == 1)
  }
}
