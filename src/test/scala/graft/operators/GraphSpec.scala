package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("triangleCounts: hand graph — K4 minus an edge plus a triangle-free edge") {
    import spark.implicits._
    // K4 on {1,2,3,4} minus (3,4): triangles {1,2,3} and {1,2,4}.
    // (5,6) participates in none.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (5L, 6L))
      .toDF("u", "v")
    val got = Graph.triangleCounts(edges).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("degree-ordered enumeration equals the naive u<v<w census on real data") {
    val edges = Graph.coOccurrenceEdges(Tables(spark, sf()).lineitem,
      col("l_orderkey"), col("l_partkey"), minSupport = 2L).cache()
    val naive = edges.as("e1")
      .join(edges.as("e2"), col("e1.v") === col("e2.u"))
      .join(edges.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .orderBy("node").collect().toSeq
    val fast = Graph.triangleCounts(edges).orderBy("node").collect().toSeq
    assert(naive.nonEmpty)
    assert(fast == naive)
    edges.unpersist()
  }

  test("triangleCounts is partitioning-independent") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val a = Graph.triangleCounts(edges).orderBy("node").collect().toSeq
    val b = Graph.triangleCounts(edges.repartition(7)).orderBy("node")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("kCore: peeling a tail cascades away; the triangle survives at k=2") {
    import spark.implicits._
    // Triangle {1,2,3} with a tail 3-5-6: node 6 has degree 1, dropping it
    // leaves 5 at degree 1 — the cascade must run more than one round.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 5L), (5L, 6L))
      .toDF("u", "v")
    val got = Graph.kCore(edges, k = 2, rounds = 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore: extra rounds past the fixpoint change nothing (real data)") {
    val edges = Graph.coOccurrenceEdges(Tables(spark, sf()).lineitem,
      col("l_orderkey"), col("l_partkey"), minSupport = 2L).cache()
    val atFix = Graph.kCore(edges, k = 3, rounds = 12).orderBy("node")
      .collect().toSeq
    val past = Graph.kCore(edges, k = 3, rounds = 15).orderBy("node")
      .collect().toSeq
    assert(atFix == past)
    edges.unpersist()
  }

  test("kCore is partitioning-independent") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
        (3L, 5L), (5L, 6L))
      .toDF("u", "v")
    val a = Graph.kCore(edges, 2, 4).orderBy("node").collect().toSeq
    val b = Graph.kCore(edges.repartition(7), 2, 4).orderBy("node")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("labelPropagation: disjoint cliques converge to their min labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("u", "v")
    val got = Graph.labelPropagation(edges, rounds = 3).orderBy("node")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("labelPropagation: hand-traced synchronized rounds across a bridge") {
    import spark.implicits._
    // two triangles joined by bridge 3-4; synchronized updates with the
    // (count DESC, label ASC) tie-break trace to A={1}, B={3} at round 4
    // (the bridge node's label leaks into B before A coalesces — exactly
    // what the synchronized semantics prescribe, and what an async sweep
    // would NOT reproduce)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
        (5L, 6L), (3L, 4L))
      .toDF("u", "v")
    val got = Graph.labelPropagation(edges, rounds = 4).orderBy("node")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation is partitioning-independent on real edges") {
    val edges = Graph.coOccurrenceEdges(Tables(spark, sf()).lineitem,
      col("l_orderkey"), col("l_partkey"), minSupport = 2L)
    val a = Graph.labelPropagation(edges, 4).orderBy("node").collect().toSeq
    val b = Graph.labelPropagation(edges.repartition(7), 4).orderBy("node")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("HITS: hand-traced two rounds on a tiny bipartite graph") {
    import spark.implicits._
    // c1->{s1,s2}, c2->{s1}.
    // Round 1: a(s1)=2, a(s2)=1; h(c1)=3, h(c2)=2.
    // Round 2: a(s1)=h(c1)+h(c2)=5, a(s2)=h(c1)=3; h(c1)=8, h(c2)=5.
    val edges = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1")).toDF("src", "dst")
    val got = Graph.hitsFixedRounds(edges, iters = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "c1" -> (0L, 8L), "c2" -> (0L, 5L),
      "s1" -> (5L, 0L), "s2" -> (3L, 0L)), got.toString)
  }

  test("HITS is partitioning-independent") {
    import spark.implicits._
    val edges = (1L to 400L).map(i => (s"c${i % 23}", s"s${(i * 11) % 17}"))
      .toDF("src", "dst")
    val a = Graph.hitsFixedRounds(edges, iters = 3)
      .orderBy("node").collect().toSeq
    val b = Graph.hitsFixedRounds(edges.repartition(9), iters = 3)
      .orderBy("node").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
