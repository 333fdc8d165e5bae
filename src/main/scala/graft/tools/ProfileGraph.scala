package graft.tools

import graft.Tables
import graft.operators.{Graph, Pipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the graph-family bench rows (q145 PPR,
  * q146 HITS, q118 triangles, q126 k-core, q132 LPA) — times each stage
  * of the query bodies separately so the optimization target is
  * measured, not guessed (guide §1). Dev tool, not part of the driver
  * contract.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[pgraph] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val t = Tables(spark, sfDir)

    // warm up scan/codegen/JIT
    for (w <- 1 to 2) time(s"warmup$w") {
      t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("l_suppkey")).distinct().count(); ()
    }

    // ---- q145 PPR stages ----
    spark.sparkContext.setJobDescription("ppr: edge construction")
    var bip: org.apache.spark.sql.DataFrame = null
    time("ppr-bip-distinct") {
      bip = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
        .distinct()
      bip.count(); ()
    }
    val edges = bip.select(col("a").as("src"), col("b").as("dst"))
      .union(bip.select(col("b").as("src"), col("a").as("dst")))
    val seeds = t.customer.filter(col("c_nationkey") === 0)
      .select(concat(lit("c"), col("c_custkey").cast("string")).as("node"))
    spark.sparkContext.setJobDescription("ppr: full")
    time("ppr-full") {
      val out = Pipeline.personalizedPageRank(edges, seeds, iters = 3)
        .select(col("node"), col("r").as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(20)
      graft.util.Consume.checksum(out); ()
    }
    // instrumented replication of personalizedPageRank internals
    locally {
      val e = edges.select(col("src"), col("dst")).cache()
      val odeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
      var nodes: org.apache.spark.sql.DataFrame = null
      var nNodes = 0L
      time("ppr-nodes-count") {
        nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst"))).distinct().cache()
        nNodes = nodes.count(); ()
      }
      var seedSet: org.apache.spark.sql.DataFrame = null
      var nSeeds = 0L
      time("ppr-seeds-count") {
        seedSet = seeds.select(col("node")).distinct()
          .join(nodes, "node").cache()
        nSeeds = seedSet.count(); ()
      }
      var base: org.apache.spark.sql.DataFrame = null
      time("ppr-base-checkpoint") {
        base = nodes
          .join(broadcast(seedSet.withColumn("is_seed", lit(true))),
            Seq("node"), "left")
          .select(col("node"),
            when(col("is_seed"), lit(1000000000000L / nSeeds)).otherwise(0L)
              .as("r0"),
            when(col("is_seed"), lit(150000000000L / nSeeds)).otherwise(0L)
              .as("restart"))
          .localCheckpoint(); ()
      }
      nodes.unpersist(false)
      seedSet.unpersist(false)
      var ej: org.apache.spark.sql.DataFrame = null
      time("ppr-ej-count") {
        ej = e.join(odeg, "src").cache()
        ej.count(); ()
      }
      e.unpersist(false)
      var ranks = base.select(col("node"), col("r0").as("r"))
      for (i <- 1 to 3) {
        time(s"ppr-round$i") {
          val contrib = ej.join(ranks, ej("src") === ranks("node"))
            .select(col("dst"), expr("r div odeg").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("m"))
          ranks = base
            .join(contrib, col("node") === contrib("dst"), "left")
            .select(col("node"),
              (col("restart") +
                expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")).as("r"))
            .localCheckpoint()
        }
      }
      time("ppr-topk") {
        ranks.orderBy(col("r").desc, col("node")).limit(20).collect(); ()
      }
      ej.unpersist(false)
    }

    // ---- q146 HITS ----
    spark.sparkContext.setJobDescription("hits: full")
    time("hits-full") {
      val de = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      val out = Graph.hitsFixedRounds(de, iters = 2)
        .select(col("node"), col("a").as("authority"), col("h").as("hub"))
        .orderBy(col("authority").desc, col("node")).limit(20)
      graft.util.Consume.checksum(out); ()
    }

    // ---- q118 triangles: edge construction vs census ----
    val li = t.lineitem
    var coEdges: org.apache.spark.sql.DataFrame = null
    spark.sparkContext.setJobDescription("tri: co-occurrence edges")
    time("tri-edges") {
      coEdges = Graph.coOccurrenceEdges(li, col("l_orderkey"),
        col("l_partkey"), minSupport = 2L).cache()
      coEdges.count(); ()
    }
    spark.sparkContext.setJobDescription("tri: census on cached edges")
    time("tri-census-cached") {
      graft.util.Consume.checksum(
        Graph.triangleCounts(coEdges).orderBy(col("node"))); ()
    }
    coEdges.unpersist(false)
    spark.sparkContext.setJobDescription("tri: full uncached (bench shape)")
    time("tri-full-uncached") {
      val e2 = Graph.coOccurrenceEdges(li, col("l_orderkey"),
        col("l_partkey"), minSupport = 2L)
      graft.util.Consume.checksum(
        Graph.triangleCounts(e2).orderBy(col("node"))); ()
    }

    // ---- q126 k-core / q132 LPA full (bench shape) ----
    time("kcore-full") {
      val e2 = Graph.coOccurrenceEdges(li, col("l_orderkey"),
        col("l_partkey"), minSupport = 2L)
      graft.util.Consume.checksum(
        Graph.kCore(e2, k = 3, rounds = 6).orderBy(col("node"))); ()
    }
    time("lpa-full") {
      val e2 = Graph.coOccurrenceEdges(li, col("l_orderkey"),
        col("l_partkey"), minSupport = 2L)
      graft.util.Consume.checksum(
        Graph.labelPropagation(e2, rounds = 4).orderBy(col("node"))); ()
    }
    spark.stop()
  }
}
