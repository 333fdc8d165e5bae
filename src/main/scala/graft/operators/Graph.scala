package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-topology operators over relationally-derived edge lists,
  * complementing the iterative family in [[Pipeline]] (PageRank, connected
  * components). The reference moves warehouse tables whose natural joins ARE
  * graphs (orders link customers/suppliers/parts — `HQL/repldump.hql` ships
  * exactly those tables); these operators are the analytics a warehouse-side
  * consumer runs on them.
  */
object Graph {

  /** Long-encoded bipartite node ids for the customer/supplier purchase
    * graphs (q85/q145/q146): `'c'||k ⇔ 2k`, `'s'||k ⇔ 2k+1`. The string
    * form is the ORACLE's output surface only — carrying it through every
    * join/aggregate made the hot shuffles string-keyed (≈6 B varying-width
    * keys, hashed per comparison); the bijective long encoding shuffles
    * 8-byte fixed-width keys through the same topology and reconstructs
    * the label once, on the final (top-k-sized) projection. Guide §2.3
    * "narrower types". Bijectivity makes every per-node sum identical.
    */
  def custNode(c: Column): Column = c.cast("long") * 2
  def suppNode(s: Column): Column = s.cast("long") * 2 + 1
  def nodeLabel(n: Column): Column =
    concat(when(n % 2 === 0, lit("c")).otherwise(lit("s")),
      shiftright(n, 1).cast("string"))

  /** Both directions of a distinct bipartite pair list in ONE scan —
    * `pairs.select(a,b).union(pairs.select(b,a))` evaluates the (often
    * expensive) pair derivation once per union LEG (two concurrent
    * subtree executions racing any cache); the explode emits both
    * directions from a single pass. Guide §2.4.
    */
  def bothDirections(pairs: DataFrame, a: String, b: String): DataFrame =
    pairs.select(explode(array(
        struct(col(a).as("src"), col(b).as("dst")),
        struct(col(b).as("src"), col(a).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** Canonical undirected edge list (u < v, deduplicated) with a minimum
    * support filter — pairs co-occurring under a blocking key at least
    * `minSupport` times. One equi-join keyed on the block (baskets are
    * small, so pairs per block are bounded) + one count shuffle.
    */
  def coOccurrenceEdges(pairs: DataFrame, block: Column, item: Column,
                        minSupport: Long): DataFrame = {
    // Deliberately the distinct + self-join form. A basket-collect
    // rewrite (groupBy(block).collect_set + in-row pair explode) was
    // tried in r13 and REVERTED on 10× evidence: collect_set/collect_list
    // plan as ObjectHashAggregate, whose in-memory map sort-falls-back
    // past `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    // (default 128 KEYS) — at block cardinalities in the millions the
    // "one exchange" becomes a full sort-aggregate and the op ran 2–4×
    // slower at sf1 (q102 2.28→9.11 s, q118 3.90→6.67 s same-day A/B)
    // while winning ~0.7 s at sf0.1. The distinct here is a true
    // fixed-width HashAggregate and the join's per-block match streams
    // pairs without materializing basket arrays.
    val b = pairs.select(block.as("blk"), item.as("it")).distinct()
    b.as("a").join(b.as("c"),
        col("a.blk") === col("c.blk") && col("a.it") < col("c.it"))
      .groupBy(col("a.it").as("u"), col("c.it").as("v"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("u"), col("v"))
  }

  /** Per-node triangle participation counts via degree-ordered edge
    * orientation (the "compact-forward" enumeration).
    *
    * Each undirected edge is directed from its lower-(degree, id) endpoint
    * to the higher; wedges are enumerated only from each node's
    * out-neighborhood and closed against the oriented edge list, so every
    * triangle is generated exactly once.
    *
    * 100 TB shape: orientation bounds every out-degree by O(sqrt(m)) —
    * the classic fix for the power-law hub that makes naive wedge
    * enumeration quadratic in the hub degree (a node with d neighbors
    * yields d² wedges unoriented, but at most m wedges total oriented).
    * The whole op is three hash joins on node ids + one count shuffle:
    * degrees (one agg), orientation (two broadcast-or-shuffle joins of
    * edges against the small degree table), wedge join (self-join of the
    * oriented list on the shared source), closure (semi-shaped inner join
    * against the oriented list), unnest + count. No iteration, no driver
    * data. The degree table is nodes-sized — broadcast when dims allow,
    * hash-partitioned otherwise; Catalyst picks per AQE stats.
    */
  def triangleCounts(edges0: DataFrame): DataFrame = {
    // Materialize the edge list ONCE: it is scanned three times below
    // (degrees, orientation, closure) and is typically the output of an
    // expensive derivation (q118's co-occurrence join aggregates ~1.2 M
    // candidate pairs down to ~3.6 k edges at sf0.1) — left lazy, each
    // scan re-runs the derivation. localCheckpoint is self-releasing and
    // the checkpointed frame is edge-list sized. Guide §2.4/§5.
    val edges = edges0.select(col("u"), col("v")).localCheckpoint()
    // Degrees over the undirected list (one scan via explode).
    val deg = edges.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // Orient: src = endpoint with smaller (degree, id).
    val du = deg.select(col("n").as("u"), col("d").as("du"))
    val dv = deg.select(col("n").as("v"), col("d").as("dv"))
    val oriented = edges.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
    // Wedges from each source's out-neighborhood, ordered to avoid the
    // mirror wedge; closed against the oriented list in either direction
    // (the b–c edge's own orientation depends on b and c's degrees).
    val e1 = oriented.select(col("src").as("a"), col("dst").as("b"))
    val e2 = oriented.select(col("src").as("a"), col("dst").as("c"))
    val wedges = e1.join(e2, Seq("a")).filter(col("b") < col("c"))
    // The closure check is against the CANONICAL u<v list itself (wedge
    // endpoints are already ordered b<c) — no extra distinct/shuffle.
    val closer = edges.select(col("u").as("b"), col("v").as("c"))
    val triangles = wedges.join(closer, Seq("b", "c"))
    // Each triangle contributes to all three corners.
    triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** `rounds` synchronized peels toward the k-core (the maximal subgraph
    * where every node keeps degree ≥ k): each round recomputes degrees over
    * the surviving edge list and drops nodes below k, cascading — the
    * network-core extraction behind influence analysis and the "dense
    * cluster of near-identical docs" view of a dedup pair graph.
    *
    * The round count is EXPLICIT (not run-to-convergence) so the op is
    * bit-reproducible against [[kCoreOracleSql]]'s unrolled-CTE oracle —
    * the q85 PageRank pattern; peeling is monotone, so `rounds` is a lower
    * bound on the fixpoint (equal once the cascade settles; GraphSpec
    * proves fixpoint identity by running extra rounds).
    *
    * 100 TB shape: each round is one degree aggregate (map-side combined
    * on the node key) + two semi-shaped joins of edges against the
    * shrinking keep-set — all hash-partitioned on node ids, no driver
    * data. The surviving edge list `localCheckpoint`s every round: the
    * lineage would otherwise nest `rounds` deep and the superseded
    * iteration's plan would defeat AQE (the q85 lesson). Peeling only
    * shrinks the frame, so checkpoint size is monotonically decreasing.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // Materialize the input ONCE before round 1: the round body references
    // `e` twice (degree aggregate + induced-edge join), so a lazy edge
    // DERIVATION would run twice in the first checkpoint's plan (the
    // triangleCounts note; same ~1.2 M-pair q118 fixture). Rounds after
    // the first read the previous round's checkpoint anyway.
    var e = edges.select(col("u"), col("v")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("n"))
      e = e.join(keep.withColumnRenamed("n", "u"), "u")
        .join(keep.withColumnRenamed("n", "v"), "v")
        .select(col("u"), col("v"))
        .localCheckpoint()
    }
    e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** Unrolled-CTE DuckDB twin of [[kCore]]: `edgesCte` must define
    * `e0(u, v)`; each round r materializes the ≥ k survivors `n_r` and the
    * induced edge list `e_r`. Machine-generated, same round count.
    */
  def kCoreOracleSql(edgesCte: String, k: Int, rounds: Int): String = {
    // Each e_r is referenced three times by round r+1; MATERIALIZED stops
    // DuckDB's CTE inlining from exponentiating the base-table scans.
    val peels = (1 to rounds).map { r =>
      s"""n$r AS MATERIALIZED (SELECT node FROM (SELECT u AS node FROM e${r - 1}
                                    UNION ALL SELECT v FROM e${r - 1})
                  GROUP BY node HAVING COUNT(*) >= $k),
          e$r AS MATERIALIZED (SELECT u, v FROM e${r - 1}
                  WHERE u IN (SELECT node FROM n$r)
                    AND v IN (SELECT node FROM n$r))"""
    }.mkString(",\n")
    s"""WITH $edgesCte,
        $peels
        SELECT node, COUNT(*) AS core_deg
        FROM (SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds)
        GROUP BY node ORDER BY node"""
  }

  /** `rounds` synchronized label-propagation steps for community detection:
    * every node simultaneously adopts the most frequent label among its
    * neighbors (ties → smallest label), starting from label = own id. The
    * non-overlapping-community complement of [[Pipeline.connectedComponents]]
    * (which only finds REACHABILITY islands — LPA splits a connected graph
    * into densely-linked groups; on a dedup pair graph it separates "hub
    * bridges two clusters" cases CC merges).
    *
    * Synchronized rounds + the (count DESC, label ASC) argmax make the
    * result a pure function of the edge list — no async sweep order, no
    * RNG — so a machine-generated unrolled-CTE oracle ([[lpaOracleSql]])
    * reproduces it bit-for-bit, the q126 pattern.
    *
    * 100 TB shape: per round, one hash join of the (node, nbr) adjacency
    * against the nodes-sized label frame, one (node, label) count
    * aggregate (map-side combined), and a per-node argmax window — all
    * partitioned on node ids, no driver data. The adjacency materializes
    * ONCE (localCheckpoint) and every round joins against it; labels
    * localCheckpoint per round so lineage never nests (the q85 lesson).
    * Hubs bound the argmax window by their distinct neighbor LABELS, which
    * shrinks as communities coalesce.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val nbrs = bothDirections(edges.select(col("u"), col("v")), "u", "v")
      .select(col("src").as("node"), col("dst").as("nbr"))
      .localCheckpoint()
    var labels = nbrs.select(col("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val counted = nbrs
        .join(labels.withColumnRenamed("node", "nbr"), "nbr")
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
      // argmax by (count DESC, label ASC) as min(struct(-c, label)) — a
      // hash aggregate (map-side partial, no sort) instead of the
      // row_number window, which needed an exchange on node PLUS a full
      // sort of every (node, label) row per round. `c` is a count ⇒
      // nonnegative long, so the negation is exact; the struct min picks
      // the largest c, ties to the smallest label, for any orderable
      // label type — exactly row_number() = 1 under (c DESC, label ASC).
      labels = counted.groupBy(col("node"))
        .agg(min(struct((-col("c")).as("nc"), col("label"))).as("m"))
        .select(col("node"), col("m.label").as("label"))
        .localCheckpoint()
    }
    labels.select(col("node"), col("label").as("community"))
  }

  /** Unrolled-CTE DuckDB twin of [[labelPropagation]]: `edgesCte` must
    * define `e0(u, v)`; same round count, same argmax tie-break.
    */
  def lpaOracleSql(edgesCte: String, rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""l$r AS MATERIALIZED (
            SELECT node, label FROM (
              SELECT n.node, l.label, COUNT(*) AS c,
                     row_number() OVER (PARTITION BY n.node
                                        ORDER BY COUNT(*) DESC, l.label) AS rn
              FROM nbrs n JOIN l${r - 1} l ON n.nbr = l.node
              GROUP BY n.node, l.label)
            WHERE rn = 1)"""
    }.mkString(",\n")
    s"""WITH $edgesCte,
        nbrs AS MATERIALIZED (SELECT u AS node, v AS nbr FROM e0
                              UNION ALL SELECT v, u FROM e0),
        l0 AS MATERIALIZED (SELECT node, node AS label
                            FROM (SELECT u AS node FROM e0
                                  UNION SELECT v FROM e0)),
        $steps
        SELECT node, label AS community FROM l$rounds ORDER BY node"""
  }

  /** `iters` synchronized HITS rounds over a DIRECTED edge list:
    * authority(v) = Σ hub over in-neighbors, then hub(u) = Σ authority
    * over out-neighbors, starting from all-ones — Kleinberg's hubs &
    * authorities, the directed-importance complement of PageRank (q85
    * ranks by random-walk mass; HITS separates "points at good things"
    * from "is pointed at by good pointers", the two roles of a bipartite
    * customer→supplier graph).
    *
    * Deliberately UNNORMALIZED: the classic per-round L2 normalization
    * only rescales (the ranking is invariant), and skipping it keeps
    * every value an exact BIGINT sum — bit-reproducible on any engine
    * and partitioning, so the oracle is an unrolled CTE with a full hash
    * match (the q85/q126/q132 pattern). Exactness bound: values grow by
    * a degree factor per half-round, so `iters` rounds stay in-range
    * while Π(degree) over the longest alternating chain < 2⁶³ — holds
    * comfortably at warehouse degrees for the small fixed `iters` used
    * here; a deployment running many rounds normalizes offline between
    * blocks.
    *
    * 100 TB shape: per round two hash joins of the edge list against the
    * nodes-sized score frame + two map-side-combinable aggregates, all
    * partitioned on node ids; edges cache once, scores localCheckpoint
    * per round (the q85 lesson).
    */
  def hitsFixedRounds(edges0: DataFrame, iters: Int): DataFrame = {
    val edges = edges0.select(col("src"), col("dst")).distinct().cache()
    // ONE scan of the (still cold) edge cache: the unionAll form's two
    // legs raced to evaluate the upstream edge derivation before the
    // first cache block landed (the r7 pageRank lesson), doubling the
    // expensive join+distinct. The explode derives the node multiset in
    // a single pass, so the materializing count below populates the
    // cache with exactly one evaluation.
    val nodes = edges.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().cache()
    nodes.count()
    var scores = nodes.select(col("node"), lit(1L).as("a"), lit(1L).as("h"))
    for (_ <- 1 to iters) {
      val auth = edges.join(scores, edges("src") === scores("node"))
        .groupBy(col("dst")).agg(sum(col("h")).as("sa"))
      val withA = nodes.join(auth, col("node") === auth("dst"), "left")
        .select(col("node"), coalesce(col("sa"), lit(0L)).as("a"))
      val hub = edges.join(withA, edges("dst") === withA("node"))
        .groupBy(col("src")).agg(sum(col("a")).as("sh"))
      scores = withA.join(hub, withA("node") === hub("src"), "left")
        .select(withA("node"), col("a"),
          coalesce(col("sh"), lit(0L)).as("h"))
        .localCheckpoint()
    }
    // the last round's localCheckpoint backs `scores`; both caches are dead
    nodes.unpersist(false)
    edges.unpersist(false)
    scores
  }

  /** Unrolled-CTE DuckDB twin of [[hitsFixedRounds]]: `edgesCte` must
    * define `e0(src, dst)` (distinct directed edges); same round count.
    */
  def hitsOracleSql(edgesCte: String, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""a$i AS MATERIALIZED (
            SELECT n.node, COALESCE(s.sa, 0) AS a
            FROM nodes n LEFT JOIN (
              SELECT e.dst AS node, SUM(s${i - 1}.h) AS sa
              FROM e0 e JOIN s${i - 1} ON s${i - 1}.node = e.src
              GROUP BY e.dst) s ON s.node = n.node),
          s$i AS MATERIALIZED (
            SELECT a$i.node, a$i.a, COALESCE(t.sh, 0) AS h
            FROM a$i LEFT JOIN (
              SELECT e.src AS node, SUM(a$i.a) AS sh
              FROM e0 e JOIN a$i ON a$i.node = e.dst
              GROUP BY e.src) t ON t.node = a$i.node)"""
    }.mkString(",\n")
    s"""WITH $edgesCte,
        nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e0
                               UNION SELECT DISTINCT dst FROM e0),
        s0 AS (SELECT node, 1 AS a, 1 AS h FROM nodes),
        $rounds
        SELECT node, CAST(a AS BIGINT) AS authority, CAST(h AS BIGINT) AS hub
        FROM s$iters"""
  }

  val queries: Seq[Query] = Seq(
    // Triangle census of the co-purchase graph (parts co-ordered >= 2
    // times): per-part triangle participation. The oracle enumerates
    // triangles naively from the canonical u<v edge list — passing proves
    // the degree-ordered enumeration is an optimization, not a different
    // census.
    Query(
      "q118_triangles",
      Some("""
        WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT a.l_partkey AS u, c.l_partkey AS v
              FROM b a JOIN b c
                ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        tri AS (SELECT e1.u AS a, e1.v AS b2, e2.v AS c
                FROM e e1 JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        SELECT node, COUNT(*) AS n_triangles
        FROM (SELECT unnest([a, b2, c]) AS node FROM tri)
        GROUP BY node ORDER BY node"""))((spark, dir) => {
      val li = Tables(spark, dir).lineitem
      val edges = coOccurrenceEdges(li, col("l_orderkey"), col("l_partkey"),
        minSupport = 2L)
      triangleCounts(edges).orderBy(col("node"))
    }),

    // 3-core of the co-purchase graph after 6 synchronized peels (the
    // dense heart of the graph; at sf0.01 peeling removes ~40% of the
    // edges and is still cascading at round 6, so the multi-round
    // semantics — not just one degree filter — are what the hash compare
    // proves). Same edge fixture as q118.
    Query(
      "q126_kcore",
      Some(kCoreOracleSql(
        """b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           e0 AS MATERIALIZED (SELECT a.l_partkey AS u, c.l_partkey AS v
                  FROM b a JOIN b c
                    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2)""",
        k = 3, rounds = 6)))((spark, dir) => {
      val li = Tables(spark, dir).lineitem
      val edges = coOccurrenceEdges(li, col("l_orderkey"), col("l_partkey"),
        minSupport = 2L)
      kCore(edges, k = 3, rounds = 6).orderBy(col("node"))
    }),

    // Communities of the co-purchase graph after 4 synchronized LPA
    // rounds — same edge fixture as q118/q126; the unrolled oracle proves
    // the multi-round synchronized semantics, not just one argmax.
    Query(
      "q132_label_prop",
      Some(lpaOracleSql(
        """b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           e0 AS MATERIALIZED (SELECT a.l_partkey AS u, c.l_partkey AS v
                  FROM b a JOIN b c
                    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2)""",
        rounds = 4)))((spark, dir) => {
      val li = Tables(spark, dir).lineitem
      val edges = coOccurrenceEdges(li, col("l_orderkey"), col("l_partkey"),
        minSupport = 2L)
      labelPropagation(edges, rounds = 4).orderBy(col("node"))
    }),

    // HITS over the DIRECTED customer→supplier purchase graph, 2 rounds:
    // top-20 authorities (the suppliers that well-connected customers
    // buy from) with their hub scores. Integer-exact, so the unrolled
    // oracle hash-matches an iterative directed-graph algorithm.
    Query(
      "q146_hits",
      Some(hitsOracleSql(
        """e0 AS MATERIALIZED (SELECT DISTINCT
                 'c' || CAST(o_custkey AS VARCHAR) AS src,
                 's' || CAST(l_suppkey AS VARCHAR) AS dst
               FROM orders JOIN lineitem ON l_orderkey = o_orderkey)""",
        iters = 2) + " ORDER BY authority DESC, node LIMIT 20"))(
      (spark, dir) => {
        val t = Tables(spark, dir)
        // long-encoded node ids through the rounds (see custNode): the
        // 'c…'/'s…' labels the oracle compares are reconstructed on the
        // top-20 projection only, BEFORE the (authority, node) order so
        // the string tie-break is unchanged
        val edges = t.orders
          .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
          .select(custNode(col("o_custkey")).as("src"),
            suppNode(col("l_suppkey")).as("dst"))
        hitsFixedRounds(edges, iters = 2)
          .select(nodeLabel(col("node")).as("node"), col("a").as("authority"),
            col("h").as("hub"))
          .orderBy(col("authority").desc, col("node")).limit(20)
      })
  )
}
