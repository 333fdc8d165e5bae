package graft.operators

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connected components match union-find on chains, stars and random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val chain = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
    val star = (1L to 40L).map(i => (0L + 100, i + 100))
    val random = Seq.fill(80)((rnd.nextLong().abs % 50 + 200, rnd.nextLong().abs % 50 + 200))
      .filter(e => e._1 != e._2)
    for ((name, edges) <- Seq(("chain", chain), ("star", star), ("random", random),
        ("all", chain ++ star ++ random))) {
      val expected = unionFind(edges)
      val got = Pipeline.connectedComponents(
          edges.toDF("doc_a", "doc_b"), maxIters = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, name)
    }
  }

  test("leakage-safe split: near-dup pairs never straddle the train/test boundary") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5).cache()
    val split = Pipeline.leakageSafeSplit(docs, "doc_id",
        Pipeline.connectedComponents(pairs))
      .select(col("doc_id"), col("split"))
    val sa = split.withColumnRenamed("doc_id", "doc_a")
      .withColumnRenamed("split", "split_a")
    val sb = split.withColumnRenamed("doc_id", "doc_b")
      .withColumnRenamed("split", "split_b")
    val straddling = pairs.join(sa, "doc_a").join(sb, "doc_b")
      .filter(col("split_a") =!= col("split_b")).count()
    assert(straddling == 0L)
    // and the split actually splits: both sides populated
    val sides = split.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(sides == Set("train", "test"), sides)
  }

  test("fixed-point PageRank equals the sequential reference on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).distinct
    // sequential fixed-point reference: identical integer arithmetic
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toLong
    val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000000000L / n).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / odeg(s) }.sum).toMap
      r = nodes.map(v => v -> (150000000000L / n + 85 * in.getOrElse(v, 0L) / 100)).toMap
    }
    val got = Pipeline.pageRankFixedPoint(
        edges.toDF("src", "dst"), iters = 3)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got == r)
  }

  test("connected components on an EMPTY pair graph is empty, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Pipeline.connectedComponents(empty).isEmpty)
  }

  test("PageRank on an EMPTY edge list is empty, not a divide-by-zero") {
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Pipeline.pageRankFixedPoint(empty).isEmpty)
  }

  test("PageRank at iters=12: checkpoint cadence bounds the plan, results unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct.toDF("src", "dst")
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.logical.collect { case p => p }.size
    val capped = Pipeline.pageRankFixedPoint(edges, iters = 12) // cadence 4
    val unbounded = Pipeline.pageRankFixedPoint(edges, iters = 12, checkpointEvery = 0)
    // without the cadence, round i's plan nests i joins — 12 rounds build a
    // plan several times larger than the truncated one (the growth that
    // makes optimizer time superlinear in iters)
    assert(planNodes(capped) * 2 < planNodes(unbounded),
      s"capped plan ${planNodes(capped)} vs unbounded ${planNodes(unbounded)}")
    // integer fixed-point: the checkpoint is invisible to the values
    assert(capped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      unbounded.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("pointer doubling converges on a long chain within O(log n) rounds") {
    import spark.implicits._
    // 120-node chain: plain propagation needs ~120 rounds; doubling must
    // finish inside the 20-iteration budget or labels would be wrong.
    val chain = (0L until 120L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Pipeline.connectedComponents(chain.toDF("doc_a", "doc_b"), maxIters = 20)
      .collect().map(r => r.getLong(1)).toSet
    assert(got == Set(0L), s"chain did not fully converge: labels $got")
  }

  test("sequence packing: distributed scan equals the sequential answer at any partition count") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sf("sf0.001")).documents.cache()
    // sequential reference: one global window per source
    val re = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
    val toks = docs.select(col("source"), col("doc_id"),
      regexp_count(lower(col("text")), lit(re)).cast("long").as("tok"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = toks
      .withColumn("chunk",
        (coalesce(sum(col("tok")).over(w), lit(0L)) / lit(512.0)).cast("long"))
      .select("source", "doc_id", "tok", "chunk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    for (nParts <- Seq(1, 3, 8)) {
      val got = Pipeline.packSequences(docs, "text", "doc_id", "source", 512, nParts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == ref, s"nParts=$nParts diverged from sequential packing")
    }
  }

  test("personalized PageRank: hand-computed single round on a two-node cycle") {
    import spark.implicits._
    // A <-> B, seed {A}. r0: A=1e12, B=0. After one round:
    // A = restart(15e10) + 85% of B's contribution (0) = 150000000000
    // B = 0 + (85 * 1e12) div 100 = 850000000000
    val edges = Seq(("A", "B"), ("B", "A")).toDF("src", "dst")
    val seeds = Seq("A").toDF("node")
    val got = Pipeline.personalizedPageRank(edges, seeds, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A" -> 150000000000L, "B" -> 850000000000L), got.toString)
  }

  test("personalized PageRank with ALL nodes as seeds equals uniform PageRank") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edges = (1L to 300L).map(i => (s"n${i % 40}", s"n${(i * 7) % 40}"))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val allNodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    val uniform = Pipeline.pageRankFixedPoint(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val personalized = Pipeline.personalizedPageRank(edges, allNodes, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uniform == personalized && uniform.nonEmpty)
  }

  test("personalized PageRank rejects empty and all-out-of-graph seed sets") {
    import spark.implicits._
    val edges = Seq(("A", "B")).toDF("src", "dst")
    val none = Seq.empty[String].toDF("node")
    intercept[IllegalArgumentException] {
      Pipeline.personalizedPageRank(edges, none, iters = 1)
    }
    // seeds that exist nowhere in the graph would silently produce
    // all-zero ranks if they merely diluted the restart mass — they must
    // error instead
    val ghosts = Seq("X", "Y").toDF("node")
    intercept[IllegalArgumentException] {
      Pipeline.personalizedPageRank(edges, ghosts, iters = 1)
    }
  }

  test("personalized PageRank: out-of-graph seeds do not dilute in-graph restart mass") {
    import spark.implicits._
    // seed set {A, GHOST}: only A is in the graph, so A carries the FULL
    // restart share (|S ∩ nodes| = 1), identical to seeding {A} alone.
    val edges = Seq(("A", "B"), ("B", "A")).toDF("src", "dst")
    val withGhost = Pipeline.personalizedPageRank(edges,
        Seq("A", "GHOST").toDF("node"), iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pure = Pipeline.personalizedPageRank(edges,
        Seq("A").toDF("node"), iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(withGhost == pure && pure.nonEmpty)
  }

  test("dedupSurvivors keeps the highest-quality member, not the smallest id") {
    import spark.implicits._
    val rich = "the quick brown fox jumps over the lazy dog and runs to " +
      "the old mill where it finds a warm place to rest for the night " +
      "while stars shine bright in the clear sky above"
    val docs = Seq(
      (1L, "junk junk junk junk junk"), // low quality, smallest id
      (2L, rich),                       // high quality
      (9L, "unclustered text")          // not in any cluster
    ).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("doc", "label")
    val got = Pipeline.dedupSurvivors(docs, "text", "doc_id", clusters)
      .collect().map(r => (r.getAs[Long]("cluster_id"),
        r.getAs[Long]("n_members"), r.getAs[Long]("survivor"))).toSeq
    assert(got == Seq((1L, 2L, 2L)), got.mkString(","))
  }

  test("dedupSurvivors: exact quality ties fall back to the smallest doc id") {
    import spark.implicits._
    val same = "identical copies share one rounded quality score here today"
    val docs = Seq((7L, same), (3L, same), (5L, same)).toDF("doc_id", "text")
    val clusters = Seq((7L, 3L), (3L, 3L), (5L, 3L)).toDF("doc", "label")
    val got = Pipeline.dedupSurvivors(docs, "text", "doc_id", clusters)
      .collect().map(r => (r.getAs[Long]("cluster_id"),
        r.getAs[Long]("n_members"), r.getAs[Long]("survivor"))).toSeq
    assert(got == Seq((3L, 3L, 3L)), got.mkString(","))
  }

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("label")).toMap

  test("incremental components: an arriving chain merges two old components to the global min") {
    import spark.implicits._
    // old components {2,5} and {7,8}; new node 100 bridges them
    val labels = Seq((2L, 2L), (5L, 2L), (7L, 7L), (8L, 7L), (30L, 30L))
      .toDF("doc", "label")
    val newPairs = Seq((5L, 100L), (100L, 8L)).toDF("doc_a", "doc_b")
    val got = labelMap(Pipeline.incrementalComponents(labels, newPairs))
    assert(got == Map(2L -> 2L, 5L -> 2L, 7L -> 2L, 8L -> 2L, 100L -> 2L,
      30L -> 30L), got.toString)
  }

  test("incremental components: new-only pairs and untouched old labels coexist") {
    import spark.implicits._
    val labels = Seq((2L, 2L), (5L, 2L)).toDF("doc", "label")
    val newPairs = Seq((200L, 201L)).toDF("doc_a", "doc_b")
    val got = labelMap(Pipeline.incrementalComponents(labels, newPairs))
    assert(got == Map(2L -> 2L, 5L -> 2L, 200L -> 200L, 201L -> 200L), got)
    // an empty batch changes nothing
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(labelMap(Pipeline.incrementalComponents(labels, none))
      == Map(2L -> 2L, 5L -> 2L))
  }

  test("incremental components: a new node with a SMALLER id relabels the whole touched component") {
    import spark.implicits._
    val labels = Seq((10L, 10L), (12L, 10L), (14L, 10L)).toDF("doc", "label")
    val newPairs = Seq((3L, 14L)).toDF("doc_a", "doc_b")
    val got = labelMap(Pipeline.incrementalComponents(labels, newPairs))
    assert(got == Map(3L -> 3L, 10L -> 3L, 12L -> 3L, 14L -> 3L), got)
  }

  test("probeLinks carry EVERY match: a batch doc bridging two components merges both") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus docs A and B sit in two separate components (labels planted
    // below); batch doc X near-dups BOTH at J = 18/20 = 0.9, where the
    // 16x4 banding's per-pair candidate miss probability is
    // (1 - 0.9^4)^16 ~ 4e-8 (the fixture must sit far above t* = 0.50 —
    // at J ~ 0.56 the S-curve misses ~18% of pairs and this deterministic
    // fixture landed in the miss zone; see the MinHashBands docstring).
    // The min-only probe keeps one link and would leave A/B unmerged;
    // probeLinks keeps both.
    val toks = ('a' to 'z').map(_.toString) ++ (1 to 10).map(i => s"w$i")
    def txt(from: Int, n: Int) = toks.slice(from, from + n).mkString(" ")
    val corpus = Seq((2L, txt(0, 20)), (7L, txt(2, 20)))
      .toDF("doc_id", "text")
    val batch = Seq((100L, txt(0, 22))).toDF("doc_id", "text")
    val idx = Dedup.lshIndexBuild(corpus, "text", "doc_id")
    val links = Dedup.lshIndexProbeLinks(idx, batch, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(links == Set((100L, 2L), (100L, 7L)), links.toString)
    // the probe's accept/reject view of the same batch keeps only min-id
    val probe = Dedup.lshIndexProbe(idx, batch, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(probe == Set((100L, 2L)), probe.toString)
    // maintenance on the FULL link set merges the two old components
    val labels = Seq((2L, 2L), (7L, 7L)).toDF("doc", "label")
    val got = labelMap(Pipeline.incrementalComponents(labels,
      Seq((100L, 2L), (100L, 7L)).toDF("doc_a", "doc_b")))
    assert(got == Map(2L -> 2L, 7L -> 2L, 100L -> 2L), got.toString)
  }

  test("incremental components equal the full recompute on the real corpus split") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sf()).documents
    val full = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5).cache()
    def isNew(c: org.apache.spark.sql.Column) = c % 10 === 7
    val oldPairs = full.filter(!isNew(col("doc_a")) && !isNew(col("doc_b")))
    val incPairs = full.filter(isNew(col("doc_a")) || isNew(col("doc_b")))
    val inc = labelMap(Pipeline.incrementalComponents(
      Pipeline.connectedComponents(oldPairs), incPairs))
    val want = labelMap(Pipeline.connectedComponents(full))
    full.unpersist()
    assert(inc == want,
      s"diff=${(inc.toSet diff want.toSet) ++ (want.toSet diff inc.toSet)}")
    assert(inc.nonEmpty)
  }
}
