package graft.operators

import graft.{Query, Tables}
import graft.util.TextPrep._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level pipeline analytics: n-gram statistics, cohort retention,
  * and near-duplicate CLUSTERS (connected components over the near-dup
  * pair graph — the step that turns pairwise dedup into "keep one doc per
  * group" at corpus scale).
  */
object Pipeline {

  /** Connected components by iterative min-label propagation PLUS pointer
    * doubling over an undirected edge list (doc_a, doc_b): every member
    * adopts the smallest doc id reachable from it. Each round does (1) a
    * neighbor-min step and (2) a shortcut step `label ← label(label)`
    * (every label is itself a node, so the composition is one self-join) —
    * the doubling halves the distance any label still has to travel, so
    * convergence is O(log diameter) rounds instead of O(diameter): a
    * 1M-node chain needs ~20 rounds, not 1M. Each round is two joins + one
    * aggregate, all distributed; the loop ends by a driver-side convergence
    * CHECK (a count), never by driver data.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // The pair graph is tiny relative to the corpus (it is the output of a
    // ≥-threshold near-dup filter); the loop's joins would otherwise pay
    // full-width shuffles per iteration. Narrow the shuffle for the loop
    // only, then restore. (On a cluster this would be a scheduler-pool +
    // AQE-coalesce concern; locally the conf is the lever.)
    // symmetric edges incl. self-loops keep isolated-after-filter nodes.
    // CRITICAL ordering: `pairs` is usually the output of a corpus-scale
    // near-dup join — materialize it (cache + count) at the session's FULL
    // shuffle parallelism BEFORE narrowing the conf for the loop, or the
    // expensive upstream join silently runs at the loop's tiny partition
    // count (an 8× regression observed at sf0.1).
    // Symmetrize with ONE pass over `pairs` (explode emits both directions
    // per row) — a union of two selects would re-run the whole upstream
    // near-dup join once per branch.
    val edges = pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct().cache()
    edges.count()
    val oldParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      var labels = edges.select(col("src").as("doc")).distinct()
        .withColumn("label", col("doc")).localCheckpoint()
      // Convergence by a MONOTONE WITNESS instead of a change-count join:
      // labels only ever decrease, so sum(label) strictly decreases until
      // the fixpoint — one map-side-combinable aggregate over the already-
      // materialized step replaces a per-iteration join + count of the
      // previous implementation (which re-shuffled both label tables every
      // round). decimal(38,0) keeps the witness overflow-proof at any
      // corpus size.
      // null-safe: an EMPTY pair graph (every shingle over the df cap, or
      // a fully-unique corpus) must yield an empty label table, not an NPE
      def labelSum(df: DataFrame): java.math.BigDecimal =
        Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0))
          .getOrElse(java.math.BigDecimal.ZERO)
      var prevSum = labelSum(labels)
      var iter = 0
      var converged = false
      while (iter < maxIters && !converged) {
        val neighborMin = edges
          .join(labels, edges("dst") === labels("doc"))
          .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
        // The doubling self-join below reads the propagation step twice —
        // a LAZY cache dedupes that work inside the single materialization
        // job that `next.localCheckpoint()` runs. (An eager localCheckpoint
        // here would add a whole extra job per round; at this loop's tiny
        // per-round data the fixed job latency IS the cost that matters.)
        val stepped = labels
          .join(neighborMin, labels("doc") === neighborMin("src"), "left")
          .select(col("doc"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
          .cache()
        // Pointer doubling: label ← min(label, label's own label). Labels
        // only ever decrease toward the component min, so this is safe and
        // cuts convergence to O(log diameter).
        val next = stepped.as("a")
          .join(stepped.select(col("doc").as("ldoc"), col("label").as("llabel")).as("b"),
            col("a.label") === col("b.ldoc"), "left")
          .select(col("a.doc").as("doc"),
            least(col("a.label"), coalesce(col("llabel"), col("a.label"))).as("label"))
          .localCheckpoint() // cut the growing lineage; the round's ONE job
        stepped.unpersist()
        val s = labelSum(next)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = next
        iter += 1
      }
      edges.unpersist() // labels is checkpoint-backed; edges no longer needed
      labels
    } finally spark.conf.set("spark.sql.shuffle.partitions", oldParts)
  }

  /** Incremental connected-components MAINTENANCE: fold a batch of newly
    * arriving near-dup pairs into an existing label map without
    * recomputing the corpus — the cluster-map counterpart of the
    * accept/reject index probes (q111/q123/q144/q149): a probe decides
    * whether a doc enters, THIS keeps the "which cluster" answer current
    * as links accumulate.
    *
    * Only the TOUCHED components recompute: the arriving edges' endpoints
    * name the labels they touch; those components' members (plus the new
    * endpoints) form a subgraph of member→label edges ∪ the new pairs,
    * and [[connectedComponents]] runs on THAT — O(touched + batch), never
    * O(corpus). Untouched label rows pass through untouched, so the
    * result is row-identical to a full recompute over old ∪ new pairs
    * (PipelineSpec proves equality; q154 proves it against the DuckDB
    * closure) — including the case where one arriving chain MERGES two
    * old components through a new node (both components relabel to the
    * global min).
    *
    * Pair-universe contract (the q150 freeze convention): `labels` must
    * come from a pair set computed under the SAME candidate universe as
    * `newPairs`, and `newPairs` must carry EVERY new link — for LSH
    * ingest that is [[Dedup.lshIndexProbeLinks]] (ALL batch↔corpus
    * matches) ∪ [[Dedup.lshPairsWithin]] (batch↔batch), NOT the probe's
    * min-only `dup_of` (a batch doc near-dupping two old components
    * carries one link there, and the second merge is silently lost).
    * With that, old ∪ new IS the full pair set and the result is
    * row-identical to the full recompute. Broadcast hints assume the
    * batch touches a batch-sized set of components; `labels` itself is
    * never shuffled, only semi-joined and anti-joined against
    * batch-derived key sets.
    */
  def incrementalComponents(labels: DataFrame, newPairs: DataFrame,
                            maxIters: Int = 20): DataFrame = {
    val ends = newPairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc")).distinct()
    val touched = labels.join(broadcast(ends), Seq("doc"), "left_semi")
      .select(col("label")).distinct()
    val affected = labels.join(broadcast(touched), Seq("label"), "left_semi")
    // member→label edges reconnect each touched component; the label node
    // is itself a member, so self rows add nothing
    val subEdges = newPairs.select(col("doc_a"), col("doc_b"))
      .unionByName(affected.filter(col("doc") =!= col("label"))
        .select(col("doc").as("doc_a"), col("label").as("doc_b")))
    val relabeled = connectedComponents(subEdges, maxIters)
    // relabeled covers every affected member and every new endpoint —
    // replace exactly those rows
    labels.join(broadcast(relabeled.select(col("doc"))), Seq("doc"),
        "left_anti")
      .unionByName(relabeled)
  }

  val queries: Seq[Query] = Seq(

    // Corpus-wide top 3-grams by document frequency.
    Query(
      "q47_ngram_top",
      Some(s"""
        WITH sh AS (SELECT doc_id, unnest(list_distinct(
            ${sqlShingles(sqlTokens("text"), 3)})) AS shingle FROM documents)
        SELECT shingle, COUNT(*) AS df
        FROM sh GROUP BY shingle
        ORDER BY df DESC, shingle
        LIMIT 20"""))((spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(array_distinct(shingles(col("toks"), 3))).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("shingle"))
        .limit(20)
    }),

    // Daily cohort retention over the events stream.
    Query(
      "q48_retention",
      Some("""
        WITH first AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort
                       FROM events GROUP BY user_id)
        SELECT CAST(cohort AS DATE) AS cohort_day,
               date_diff('day', cohort, date_trunc('day', e.ts)) AS day_n,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM events e JOIN first f ON e.user_id = f.user_id
        GROUP BY 1, 2
        ORDER BY cohort_day, day_n"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val first = t.events.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort"))
      t.events.join(first, "user_id")
        .groupBy(
          col("cohort").cast("date").as("cohort_day"),
          datediff(date_trunc("day", col("ts")), col("cohort")).cast("long").as("day_n"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy(col("cohort_day"), col("day_n"))
    }),

    // Deterministic stratified sampling: hash-Bernoulli per language —
    // the reproducible-subset op of a training-data pipeline (same rows
    // regardless of partitioning, cluster size, or execution order; no
    // RNG state). Rates: downsample the majority language (en 10%),
    // keep half of the rest.
    Query(
      "q50_stratified_sample",
      Some(s"""
        SELECT doc_id, lang
        FROM documents
        WHERE (${sqlH48("'graft-sample-1' || CAST(doc_id AS VARCHAR)")} % 10000)
              < (CASE WHEN lang = 'en' THEN 1000 ELSE 5000 END)
        ORDER BY doc_id"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val bucket = h48(concat(lit("graft-sample-1"), col("doc_id").cast("string"))) % 10000
      t.documents
        .filter(bucket < when(col("lang") === "en", 1000).otherwise(5000))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Near-dup clusters: connected components over the q24 pair graph;
    // cluster id = min doc id in the component (the "keep" representative).
    Query(
      "q49_dedup_clusters",
      Some(s"""
        WITH RECURSIVE sh0 AS (SELECT doc_id AS doc,
               unnest(list_distinct(list_transform(
                 ${sqlShingles(sqlTokens("text"), 3)}, s -> ${sqlH48("s")}))) AS sh
             FROM documents),
        ok AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 20),
        shf AS (SELECT doc, sh0.sh FROM sh0 JOIN ok USING (sh)),
        sz AS (SELECT doc, COUNT(*) AS sz FROM shf GROUP BY doc),
        inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS i
                  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc < b.doc
                  GROUP BY 1, 2),
        pairs AS (SELECT doc_a, doc_b FROM inter
                  JOIN sz sa ON sa.doc = doc_a JOIN sz sb ON sb.doc = doc_b
                  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT doc, least(doc, min(dst)) AS cluster_id
        FROM (SELECT src AS doc, dst FROM reach)
        GROUP BY doc
        ORDER BY doc"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val pairs = Dedup.ngramJaccardPairs(t.documents, "text", "doc_id", 3, 0.5)
      connectedComponents(pairs)
        .select(col("doc"), col("label").as("cluster_id"))
        .orderBy(col("doc"))
    }),

    // Incremental cluster maintenance: the q49 label map built WITHOUT the
    // "new" docs (doc_id % 10 = 7), then the arriving docs' pairs fold in
    // via incrementalComponents — only touched components recompute. The
    // oracle is q49's full-recompute closure over ALL pairs: passing
    // proves the incremental fold is row-identical to recomputing the
    // corpus, including batch edges that MERGE old components.
    Query(
      "q154_incremental_clusters",
      Some(s"""
        WITH RECURSIVE sh0 AS (SELECT doc_id AS doc,
               unnest(list_distinct(list_transform(
                 ${sqlShingles(sqlTokens("text"), 3)}, s -> ${sqlH48("s")}))) AS sh
             FROM documents),
        ok AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 20),
        shf AS (SELECT doc, sh0.sh FROM sh0 JOIN ok USING (sh)),
        sz AS (SELECT doc, COUNT(*) AS sz FROM shf GROUP BY doc),
        inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS i
                  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc < b.doc
                  GROUP BY 1, 2),
        pairs AS (SELECT doc_a, doc_b FROM inter
                  JOIN sz sa ON sa.doc = doc_a JOIN sz sb ON sb.doc = doc_b
                  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT doc, least(doc, min(dst)) AS cluster_id
        FROM (SELECT src AS doc, dst FROM reach)
        GROUP BY doc
        ORDER BY doc"""))((spark, dir) => {
      val t = Tables(spark, dir)
      // ONE pair universe (the q150 freeze convention): the full-corpus
      // pair set splits into "already known" (both endpoints old) and
      // "arriving" (any endpoint new) — old ∪ new is the oracle's set
      val full = Dedup.ngramJaccardPairs(t.documents, "text", "doc_id",
        3, 0.5).cache()
      def isNew(c: Column) = c % 10 === 7
      val oldPairs = full.filter(!isNew(col("doc_a")) && !isNew(col("doc_b")))
      val incPairs = full.filter(isNew(col("doc_a")) || isNew(col("doc_b")))
      incrementalComponents(connectedComponents(oldPairs), incPairs)
        .select(col("doc"), col("label").as("cluster_id"))
        .orderBy(col("doc"))
    }),

    // The END PRODUCT of the dedup family: the deduped corpus itself. Every
    // near-dup cluster keeps only its representative (min doc id = the
    // component label); all other docs pass through. The drop list is tiny
    // (cluster members minus representatives), so the anti-join broadcasts
    // — the corpus is scanned once and never shuffles.
    Query(
      "q56_corpus_dedup",
      Some(s"""
        WITH RECURSIVE sh0 AS (SELECT doc_id AS doc,
               unnest(list_distinct(list_transform(
                 ${sqlShingles(sqlTokens("text"), 3)}, s -> ${sqlH48("s")}))) AS sh
             FROM documents),
        ok AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 20),
        shf AS (SELECT doc, sh0.sh FROM sh0 JOIN ok USING (sh)),
        sz AS (SELECT doc, COUNT(*) AS sz FROM shf GROUP BY doc),
        inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS i
                  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc < b.doc
                  GROUP BY 1, 2),
        pairs AS (SELECT doc_a, doc_b FROM inter
                  JOIN sz sa ON sa.doc = doc_a JOIN sz sb ON sb.doc = doc_b
                  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        removed AS (
          SELECT doc FROM (
            SELECT doc, least(doc, min(dst)) AS cluster_id
            FROM (SELECT src AS doc, dst FROM reach) GROUP BY doc)
          WHERE cluster_id < doc)
        SELECT d.doc_id, d.n_chars
        FROM documents d LEFT JOIN removed r ON r.doc = d.doc_id
        WHERE r.doc IS NULL
        ORDER BY d.doc_id"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val pairs = Dedup.ngramJaccardPairs(t.documents, "text", "doc_id", 3, 0.5)
      val drop = connectedComponents(pairs)
        .filter(col("doc") =!= col("label")).select(col("doc").as("drop_doc"))
      t.documents.join(broadcast(drop),
          col("doc_id") === col("drop_doc"), "left_anti")
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Train/eval CONTAMINATION detection — the decontamination pass every
    // LLM training pipeline runs before a benchmark eval: find training
    // docs whose 5-gram shingle CONTAINMENT of an eval doc (|T∩E| / |E|)
    // clears 0.5. Eval set = every 11th doc. The eval side is tiny by
    // construction, so its shingle set broadcasts and the training corpus
    // is scanned exactly once — no corpus self-join.
    Query(
      "q72_contamination",
      Some(s"""
        WITH esh AS (SELECT doc_id AS edoc,
                       unnest(list_distinct(list_transform(
                         ${sqlShingles(sqlTokens("text"), 5)}, s -> ${sqlH48("s")}))) AS sh
                     FROM documents WHERE doc_id % 11 = 0),
        tsh AS (SELECT doc_id AS tdoc,
                  unnest(list_distinct(list_transform(
                    ${sqlShingles(sqlTokens("text"), 5)}, s -> ${sqlH48("s")}))) AS sh
                FROM documents WHERE doc_id % 11 <> 0),
        esz AS (SELECT edoc, COUNT(*) AS sz FROM esh GROUP BY edoc),
        inter AS (SELECT tdoc, edoc, COUNT(*) AS i
                  FROM tsh JOIN esh USING (sh) GROUP BY 1, 2)
        SELECT edoc AS eval_doc, tdoc AS train_doc,
               round(i * 1.0 / sz, 6) AS containment
        FROM inter JOIN esz USING (edoc)
        WHERE i * 1.0 / sz >= 0.5
        ORDER BY eval_doc, train_doc"""))((spark, dir) => {
      val t = Tables(spark, dir)
      contamination(t.documents, "text", "doc_id",
          isEval = col("doc_id") % 11 === 0, n = 5, threshold = 0.5)
        .orderBy(col("eval_doc"), col("train_doc"))
    }),

    // Ordered funnel over the event stream: signup → click → purchase,
    // each stage's first occurrence must FOLLOW the previous stage's.
    // One groupBy + one global aggregate — conditional-min pivoting, no
    // self-joins or windows over the raw events.
    Query(
      "q76_funnel",
      Some("""
        WITH st AS (
          SELECT user_id,
                 min(ts) FILTER (event_type = 'signup') AS t_signup,
                 min(ts) FILTER (event_type = 'click') AS t_click,
                 min(ts) FILTER (event_type = 'purchase') AS t_purchase
          FROM events GROUP BY user_id)
        SELECT count(t_signup) AS n_signup,
               count(*) FILTER (t_click > t_signup) AS n_then_click,
               count(*) FILTER (t_purchase > t_click AND t_click > t_signup)
                 AS n_then_purchase
        FROM st"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val st = t.events.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      st.agg(
        count(col("t_signup")).as("n_signup"),
        count(when(col("t_click") > col("t_signup"), 1)).as("n_then_click"),
        count(when(col("t_purchase") > col("t_click") &&
          col("t_click") > col("t_signup"), 1)).as("n_then_purchase"))
    }),

    // Sequence packing for pretraining: per-(source, chunk) stats of the
    // greedy 512-token concatenation batcher. The oracle replays the packing
    // with a plain sequential window — the distributed two-level scan must
    // agree exactly (and PipelineSpec pins it at several partition counts).
    Query(
      "q79_sequence_packing",
      Some("""
        WITH t AS (SELECT source, doc_id,
                     len(regexp_extract_all(lower(text),
                       '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS tok
                   FROM documents),
        c AS (SELECT source, doc_id, tok,
                COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
              FROM t)
        SELECT source, CAST(st // 512 AS BIGINT) AS chunk,
               COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS chunk_tokens,
               MIN(doc_id) AS first_doc
        FROM c GROUP BY source, chunk
        ORDER BY source, chunk"""))((spark, dir) => {
      val t = Tables(spark, dir)
      packSequences(t.documents, "text", "doc_id", "source", ctxTokens = 512)
        .groupBy(col("source"), col("chunk"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("chunk_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("source"), col("chunk"))
    }),

    // Quality-weighted sampling: each doc keeps with probability equal to
    // its quality score, via the deterministic h48 coin. Per-source counts
    // let the oracle verify the exact sample AND show it tracks the
    // expected size (sum of weights).
    Query(
      "q81_weighted_sample",
      Some(s"""
        WITH q AS (${graft.operators.TextAnalysis.qualityOracleSql("documents", "text", "doc_id")}),
        j AS (SELECT d.source, q.quality,
                CASE WHEN ${sqlH48("CAST(d.doc_id AS VARCHAR) || ':ws'")}
                     < q.quality * 281474976710656 THEN 1 ELSE 0 END AS s
              FROM documents d JOIN q ON q.doc = d.doc_id)
        SELECT source, COUNT(*) AS n_docs, CAST(SUM(s) AS BIGINT) AS n_sampled,
               round(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE), 4)
                 AS expected
        FROM j GROUP BY source ORDER BY source"""))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      val q = TextAnalysis.qualityScore(docs, "text", "doc_id")
      val j = docs.join(q, docs("doc_id") === q("doc"))
      weightedSample(j, col("quality"), col("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
          round(sum(col("quality").cast(
            org.apache.spark.sql.types.DecimalType(18, 6))).cast("double"), 4)
            .as("expected"))
        .orderBy(col("source"))
    }),

    // Leakage-safe train/test split: the coin is tossed per near-dup
    // CLUSTER (h48 on the cluster id, test fraction 1/8), so near-twins
    // never straddle the boundary. Oracle recomputes clusters via the
    // recursive-CTE closure (q49's fragment) and the identical coin.
    Query(
      "q84_leakage_split",
      Some(s"""
        WITH RECURSIVE sh0 AS (SELECT doc_id AS doc,
               unnest(list_distinct(list_transform(
                 ${sqlShingles(sqlTokens("text"), 3)}, s -> ${sqlH48("s")}))) AS sh
             FROM documents),
        ok AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 20),
        shf AS (SELECT doc, sh0.sh FROM sh0 JOIN ok USING (sh)),
        sz AS (SELECT doc, COUNT(*) AS sz FROM shf GROUP BY doc),
        inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS i
                  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc < b.doc
                  GROUP BY 1, 2),
        pairs AS (SELECT doc_a, doc_b FROM inter
                  JOIN sz sa ON sa.doc = doc_a JOIN sz sb ON sb.doc = doc_b
                  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        comp AS (SELECT doc, least(doc, min(dst)) AS cluster_id
                 FROM (SELECT src AS doc, dst FROM reach) GROUP BY doc),
        lab AS (SELECT d.doc_id, d.n_chars,
                       COALESCE(c.cluster_id, d.doc_id) AS cluster
                FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id),
        sp AS (SELECT *,
                 CASE WHEN ${sqlH48("CAST(cluster AS VARCHAR) || ':split'")}
                      < 35184372088832 THEN 'test' ELSE 'train' END AS split
               FROM lab)
        SELECT split, COUNT(*) AS n_docs,
               COUNT(DISTINCT cluster) AS n_clusters,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM sp GROUP BY split ORDER BY split"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val pairs = graft.operators.Dedup.ngramJaccardPairs(
        t.documents, "text", "doc_id", 3, 0.5)
      leakageSafeSplit(t.documents, "doc_id", connectedComponents(pairs))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("cluster")).as("n_clusters"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"))
    }),

    // Fixed-point PageRank (3 rounds, damping 0.85) over the undirected
    // customer–supplier interaction graph. Integer fixed-point arithmetic
    // makes every round exact, so the oracle is 3 unrolled CTEs — a full
    // hash-match check on an iterative graph algorithm.
    Query(
      "q85_pagerank",
      Some {
        def round(i: Int): String = s"""
        r$i AS (SELECT nd.node,
                 (150000000000 // mx.n_nodes)
                   + (85 * COALESCE(s.m, 0)) // 100 AS r
               FROM nodes nd CROSS JOIN n mx
               LEFT JOIN (SELECT e.dst AS node, SUM(r${i - 1}.r // o.odeg) AS m
                          FROM edges e JOIN r${i - 1} ON r${i - 1}.node = e.src
                          JOIN odeg o ON o.src = e.src
                          GROUP BY e.dst) s ON s.node = nd.node)"""
        s"""
        WITH e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                           's' || CAST(l_suppkey AS VARCHAR) AS b
                    FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        edges AS (SELECT a AS src, b AS dst FROM e0
                  UNION ALL SELECT b, a FROM e0),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
        odeg AS (SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src),
        r0 AS (SELECT node, 1000000000000 // n_nodes AS r
               FROM nodes CROSS JOIN n),
        ${round(1)},
        ${round(2)},
        ${round(3)}
        SELECT node, CAST(r AS BIGINT) AS pr
        FROM r3 ORDER BY pr DESC, node LIMIT 20"""
      })((spark, dir) => {
      val t = Tables(spark, dir)
      // long-encoded nodes through the rounds; both edge directions in
      // one scan of the distinct pair set (Graph.bothDirections — the
      // union form evaluated the join+distinct once per leg). The
      // 'c…'/'s…' labels reconstruct on the top-20 projection, before
      // the (pr, node) order, so the string tie-break is unchanged.
      val base = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(Graph.custNode(col("o_custkey")).as("a"),
          Graph.suppNode(col("l_suppkey")).as("b"))
        .distinct()
      val edges = Graph.bothDirections(base, "a", "b")
      pageRankFixedPoint(edges, iters = 3)
        .select(Graph.nodeLabel(col("node")).as("node"), col("r").as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(20)
    }),

    // Quality-aware dedup survivor selection: per near-dup cluster (the
    // q49 components), keep the copy with the HIGHEST q30 quality score
    // (ties -> smallest doc id), not the smallest id — at corpus scale
    // near-dup groups routinely pair a clean original with truncated or
    // boilerplate-wrapped mirrors, and min-id keeps whichever crawled
    // first. Scale shape: the cluster map is pair-graph sized (tiny vs
    // the corpus), so membership BROADCASTS into one corpus scan and
    // quality is computed for members only; the survivor argmax windows
    // over clusters, whose partitions are cluster-sized. Ranking compares
    // the once-rounded quality (engine-identical by q30's gate), then
    // doc id.
    Query(
      "q137_dedup_survivor",
      Some(s"""
        WITH RECURSIVE sh0 AS (SELECT doc_id AS doc,
               unnest(list_distinct(list_transform(
                 ${sqlShingles(sqlTokens("text"), 3)}, s -> ${sqlH48("s")}))) AS sh
             FROM documents),
        ok AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 20),
        shf AS (SELECT doc, sh0.sh FROM sh0 JOIN ok USING (sh)),
        sz AS (SELECT doc, COUNT(*) AS sz FROM shf GROUP BY doc),
        inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS i
                  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc < b.doc
                  GROUP BY 1, 2),
        pairs AS (SELECT doc_a, doc_b FROM inter
                  JOIN sz sa ON sa.doc = doc_a JOIN sz sb ON sb.doc = doc_b
                  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        clusters AS (
          SELECT doc, least(doc, min(dst)) AS cluster_id
          FROM (SELECT src AS doc, dst FROM reach)
          GROUP BY doc),
        q AS (${graft.operators.TextAnalysis.qualityOracleSql(
                 "documents", "text", "doc_id")}),
        ranked AS (
          SELECT c.cluster_id, c.doc, q.quality,
                 row_number() OVER (PARTITION BY c.cluster_id
                                    ORDER BY q.quality DESC, c.doc) AS rn,
                 COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
          FROM clusters c JOIN q ON q.doc = c.doc)
        SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
               doc AS survivor, quality AS survivor_quality
        FROM ranked WHERE rn = 1
        ORDER BY cluster_id"""))((spark, dir) => {
      val t = Tables(spark, dir)
      val pairs = Dedup.ngramJaccardPairs(t.documents, "text", "doc_id", 3, 0.5)
      dedupSurvivors(t.documents, "text", "doc_id", connectedComponents(pairs))
        .orderBy(col("cluster_id"))
    }),

    // Personalized PageRank (3 rounds, damping 0.85, restart at the
    // nation-0 customers PRESENT in the graph — customers with no orders
    // carry no restart share) over the same customer-supplier graph as
    // q85: which
    // suppliers and customers matter RELATIVE to one market. Integer
    // fixed-point end to end, so the oracle is 3 unrolled CTEs with a
    // full hash match — the q85 proof extended with a seeded restart.
    Query(
      "q145_ppr",
      Some {
        def round(i: Int): String = s"""
        r$i AS (SELECT b.node,
                 b.restart + (85 * COALESCE(s.m, 0)) // 100 AS r
               FROM base b
               LEFT JOIN (SELECT e.dst AS node, SUM(r${i - 1}.r // o.odeg) AS m
                          FROM edges e JOIN r${i - 1} ON r${i - 1}.node = e.src
                          JOIN odeg o ON o.src = e.src
                          GROUP BY e.dst) s ON s.node = b.node)"""
        s"""
        WITH e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                           's' || CAST(l_suppkey AS VARCHAR) AS b
                    FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        edges AS (SELECT a AS src, b AS dst FROM e0
                  UNION ALL SELECT b, a FROM e0),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        seeds0 AS (SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
                   FROM customer WHERE c_nationkey = 0),
        seeds AS (SELECT s.node FROM seeds0 s JOIN nodes n ON n.node = s.node),
        sx AS (SELECT COUNT(*) AS n_seeds FROM seeds),
        odeg AS (SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src),
        base AS (SELECT nd.node,
                   CASE WHEN sd.node IS NOT NULL
                        THEN 1000000000000 // x.n_seeds ELSE 0 END AS r0,
                   CASE WHEN sd.node IS NOT NULL
                        THEN 150000000000 // x.n_seeds ELSE 0 END AS restart
                 FROM nodes nd CROSS JOIN sx x
                 LEFT JOIN seeds sd ON sd.node = nd.node),
        r0 AS (SELECT node, r0 AS r FROM base),
        ${round(1)},
        ${round(2)},
        ${round(3)}
        SELECT node, CAST(r AS BIGINT) AS pr
        FROM r3 ORDER BY pr DESC, node LIMIT 20"""
      })((spark, dir) => {
      val t = Tables(spark, dir)
      // long-encoded nodes + one-scan bidirection edges — the q85 recipe
      val bip = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(Graph.custNode(col("o_custkey")).as("a"),
          Graph.suppNode(col("l_suppkey")).as("b"))
        .distinct()
      val edges = Graph.bothDirections(bip, "a", "b")
      val seeds = t.customer.filter(col("c_nationkey") === 0)
        .select(Graph.custNode(col("c_custkey")).as("node"))
      personalizedPageRank(edges, seeds, iters = 3)
        .select(Graph.nodeLabel(col("node")).as("node"), col("r").as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(20)
    })
  )

  /** Per-cluster survivor selection over a near-dup cluster map
    * (`clusters`: (doc, label) as produced by [[connectedComponents]]):
    * each cluster keeps its highest-[[TextAnalysis.qualityScore]] member,
    * ties broken by smallest doc id. Returns one row per cluster with its
    * size and the survivor's id + quality.
    *
    * 100 TB shape: the cluster map is the output of a thresholded
    * near-dup pass — tiny relative to the corpus — so it broadcasts into
    * a single corpus scan (inner join ⇒ quality evaluates ONLY for
    * cluster members, never the full corpus); the argmax windows
    * partition per cluster (bounded by cluster size, and the pathological
    * giant cluster is exactly the boilerplate family a pipeline caps
    * upstream). Ranking compares the once-rounded quality — already
    * proved engine-identical by q30's hash gate — then the doc id, so the
    * survivor choice is deterministic on any engine and partitioning.
    */
  def dedupSurvivors(docs: DataFrame, textCol: String, idCol: String,
                     clusters: DataFrame): DataFrame = {
    val members = docs.join(
        broadcast(clusters.select(col("doc").as(idCol),
          col("label").as("cluster_id"))), idCol)
      .select(col("cluster_id"), col(idCol).as("doc"),
        TextAnalysis.qualityScoreExpr(col(textCol)).as("quality"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc"))
    members
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(
        Window.partitionBy(col("cluster_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("n_members"), col("doc").as("survivor"),
        col("quality").as("survivor_quality"))
  }

  /** Fixed-point PageRank over a directed edge list, `iters` synchronous
    * rounds. Ranks are held as INTEGER fixed-point (rank · 10¹²) and every
    * step is integer arithmetic — `r div outdeg` per edge, exact LONG sums,
    * `(85·Σ) div 100` damping — so the result is bit-identical at any
    * partition count and in any engine (no double-sum ordering, no decimal
    * scale rules). The deliberate trade: ~1e-12 quantization per step,
    * irrelevant for ranking, in exchange for exact distributed determinism.
    *
    * Scale shape: per round, one join of the edge list with the rank table
    * (both hash-partitioned on src — the edge side's exchange is reused
    * across rounds from the cached frame) and one map-side-combinable
    * groupBy(dst) sum. Dangling mass is dropped (engine-defined, mirrored
    * in the oracle); nodes with no in-edges keep the teleport base.
    */
  def pageRankFixedPoint(edges0: DataFrame, iters: Int = 3,
                         checkpointEvery: Int = 4): DataFrame = {
    // Cache the EDGE LIST itself and materialize it once (via the node
    // count below) before any round plans against it. Everything here —
    // odeg, nodes, ej, every round's join — derives from `edges`; left
    // uncached, the action's concurrently-launched subtrees each recompute
    // the upstream edge derivation (typically an expensive join+distinct)
    // before the first cache block lands. At 587 k distinct edges that
    // duplication was a measured ~7× cold-run inflation (r7 regression).
    val edges = edges0.select(col("src"), col("dst")).cache()
    val odeg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    // node multiset in ONE scan of the still-cold edge cache: the old
    // union form's two legs raced to evaluate the upstream edge
    // derivation before the first cache block landed, re-paying the
    // join+distinct once more (measured ~3 s of q85/q145's cost at
    // sf0.1 — the r7 lesson recurring inside the node derivation itself)
    val nodes = edges.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().cache()
    // n_nodes is ONE scalar: read it on the driver (control-plane sized)
    // and embed it as a literal, instead of a broadcast 1-row frame cross-
    // joined into every round — each of those broadcast subtrees is an
    // eagerly-launched job that raced to recompute the uncached edge
    // derivation. This count doubles as the materialization barrier for
    // both caches (it scans edges and builds nodes). Scala Long `/` on
    // positive operands is the same floor division as SQL `div`.
    val nNodes = nodes.count()
    // Empty graph: no nodes, no ranks — return the empty (node, r) frame
    // instead of letting the driver-side literal below divide by zero.
    if (nNodes == 0L) {
      edges.unpersist(false)
      return nodes.select(col("node"), lit(0L).as("r"))
    }
    val ej = edges.join(odeg, "src").cache() // (src, dst, odeg)
    // Materialize ej from the cached edge list, then DROP the edge cache:
    // ej strictly supersedes it for the rounds, and keeping both at large
    // scale squeezes execution memory for the rounds' own shuffles (at 30×
    // the double footprint measurably thrashed: 103 s vs 40 s cold). The
    // eager count also stops round-1's concurrent stages from racing to
    // build ej.
    ej.count()
    edges.unpersist(false)
    var ranks = nodes.select(col("node"), lit(1000000000000L / nNodes).as("r"))
    for (i <- 1 to iters) {
      val contrib = ej.join(ranks, ej("src") === ranks("node"))
        .select(col("dst"), expr("r div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      ranks = nodes
        .join(contrib, col("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(150000000000L / nNodes) +
            expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")).as("r"))
      // Lineage cadence: every K rounds the rank frame is materialized and
      // the plan truncated (same policy as connectedComponents) — without
      // this, round i's plan nests i joins, and both optimizer time and
      // task-serialized plan size grow superlinearly in iters. Values are
      // integer fixed-point, so checkpointing cannot perturb the result.
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Personalized PageRank: the teleport mass restarts at a SEED set
    * instead of uniformly — ranks measure importance RELATIVE to the
    * seeds (crawl prioritization from trusted roots, related-entity
    * expansion from a query set). Same integer fixed-point contract as
    * [[pageRankFixedPoint]]: rank·10¹² held as LONG, per-round
    * `r div odeg` edge contributions, exact sums, `(85·Σ) div 100`
    * damping — and the per-node restart base is `150000000000 div |S|`
    * on seeds, 0 elsewhere, so every round is
    * bit-exact on any engine and partitioning and the oracle is an
    * unrolled CTE with a full hash match.
    *
    * 100 TB shape: identical to the uniform variant (one cached
    * edge-with-odeg frame, one join + one map-side-combinable aggregate
    * per round, lineage checkpoint cadence) plus a nodes-sized restart
    * base computed ONCE (seed set broadcast into one join) and reused by
    * every round.
    */
  def personalizedPageRank(edges0: DataFrame, seeds: DataFrame,
                           iters: Int = 3,
                           checkpointEvery: Int = 4): DataFrame = {
    val edges = edges0.select(col("src"), col("dst")).cache()
    val odeg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    // one-scan node derivation — same rationale as pageRankFixedPoint
    val nodes = edges.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct().cache()
    val nNodes = nodes.count()
    if (nNodes == 0L) {
      edges.unpersist(false)
      return nodes.select(col("node"), lit(0L).as("r"))
    }
    // Restart mass distributes over seeds PRESENT IN THE GRAPH — a seed
    // with no edges cannot receive or forward mass, and silently deleting
    // its 1/|S| share would make total rank mass depend on how stale the
    // seed list is. Seed count is a driver literal (control-plane sized),
    // like n_nodes; an all-out-of-graph (or empty) seed set is an error,
    // not a silent all-zero result.
    val seedSet = seeds.select(col("node")).distinct()
      .join(nodes, "node").cache()
    val nSeeds = seedSet.count()
    require(nSeeds > 0,
      "personalized PageRank needs at least one seed present in the graph")
    // Restart base per node, computed ONCE and reused by r0 and every
    // round: 10¹²/|S| initial mass and 15·10¹⁰/|S| per-round teleport on
    // seeds, zero elsewhere. The seed set broadcasts into the one join.
    val base = nodes
      .join(broadcast(seedSet.withColumn("is_seed", lit(true))),
        Seq("node"), "left")
      .select(col("node"),
        when(col("is_seed"), lit(1000000000000L / nSeeds)).otherwise(0L)
          .as("r0"),
        when(col("is_seed"), lit(150000000000L / nSeeds)).otherwise(0L)
          .as("restart"))
      .localCheckpoint()
    // base is checkpoint-backed; its inputs are dead — drop them before
    // the rounds (the double-footprint lesson in pageRankFixedPoint)
    nodes.unpersist(false)
    seedSet.unpersist(false)
    val ej = edges.join(odeg, "src").cache()
    ej.count()
    edges.unpersist(false)
    var ranks = base.select(col("node"), col("r0").as("r"))
    for (i <- 1 to iters) {
      val contrib = ej.join(ranks, ej("src") === ranks("node"))
        .select(col("dst"), expr("r div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      ranks = base
        .join(contrib, col("node") === contrib("dst"), "left")
        .select(col("node"),
          (col("restart") +
            expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")).as("r"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Leakage-safe train/test split: the split coin is tossed per NEAR-DUP
    * CLUSTER, not per document — h48(cluster ‖ salt) < 2⁴⁸·testFrac — so
    * two near-duplicate documents can never straddle the train/test
    * boundary (the classic eval-leakage failure of row-wise splitting:
    * a test doc's near-twin in train inflates every benchmark number).
    * Docs in no cluster are their own singleton (coalesce to own id).
    *
    * Scale shape: the cluster map is the (tiny) connected-components
    * output, broadcast-joined onto the corpus scan; the coin is a per-row
    * codegen'd predicate. One corpus scan, zero extra shuffles beyond the
    * near-dup pairing that produced the clusters. testNum/testDen keep the
    * threshold an exact integer (2⁴⁸·num/den), reproducible in any engine.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
                       testNum: Long = 1, testDen: Long = 8,
                       salt: String = "split"): DataFrame = {
    require(281474976710656L % testDen == 0, "testDen must divide 2^48 exactly")
    val threshold = 281474976710656L / testDen * testNum
    docs.join(broadcast(clusters.select(col("doc"), col("label"))),
        docs(idCol) === col("doc"), "left")
      .withColumn("cluster", coalesce(col("label"), docs(idCol)))
      .drop("doc", "label")
      .withColumn("split",
        when(h48(concat(col("cluster").cast("string"), lit(":" + salt))) <
          threshold, "test").otherwise("train"))
  }

  /** Quality-weighted (importance) sampling: keep each row with probability
    * `weightCol` (∈ [0,1]) using a DETERMINISTIC hash coin —
    * `h48(id || salt) < weight · 2⁴⁸` — instead of `rand()`. Same contract
    * as q50's stratified sampler, generalized to per-row rates: the sample
    * is reproducible at any parallelism (no RNG state per partition), the
    * salt gives independent draws for repeated sampling passes, and the
    * whole thing is a per-row codegen'd predicate — zero shuffle. This is
    * the quality-proportional downsampling step of modern pretraining
    * pipelines (sample high-quality docs preferentially rather than hard
    * thresholding).
    */
  def weightedSample(df: DataFrame, weightCol: Column, idCol: Column,
                     salt: String = "ws"): DataFrame =
    df.withColumn("sampled",
      h48(concat(idCol.cast("string"), lit(":" + salt))) <
        weightCol * lit(math.pow(2, 48)))

  /** Pack documents into fixed token-budget training chunks: stream each
    * source's docs in doc_id order into a contiguous token tape and cut it
    * every `ctxTokens` tokens — each doc lands in chunk
    * `floor(tokens_before_it / ctxTokens)` (greedy concatenation packing,
    * the standard pretraining batcher).
    *
    * The prefix sum is DISTRIBUTED (classic two-level scan), because the
    * naive `Window.partitionBy(source)` puts an entire source — billions of
    * docs at 100 TB — into ONE window partition. Instead: range-partition
    * by (source, doc_id), run the running sum within each partition
    * (bounded by partition size, not source size), and add a per-(partition,
    * source) carry offset computed from a tiny totals frame (n_partitions ×
    * n_sources rows — broadcast). The chunk ids are exactly the sequential
    * answer regardless of where the range boundaries fall, so the result is
    * partition-count independent. `ctxTokens` must be a power of two so the
    * final `start / ctx` division is exact in double.
    */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
                    sourceCol: String, ctxTokens: Int, nParts: Int = 8): DataFrame = {
    require((ctxTokens & (ctxTokens - 1)) == 0, "ctxTokens must be a power of 2")
    val re = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
    val toks = docs.select(col(sourceCol).as("source"), col(idCol).as("doc_id"),
      regexp_count(lower(col(textCol)), lit(re)).cast("long").as("tok"))
    val parted = toks.repartitionByRange(nParts, col("source"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
    // Running sum of PRECEDING docs within this partition's slice of the
    // source. The window groups are (pid, source) — never larger than one
    // range partition.
    val wIn = Window.partitionBy(col("pid"), col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withIn = parted.withColumn("cum_in",
      coalesce(sum(col("tok")).over(wIn), lit(0L)))
    // Carry: for each (pid, source), total tokens in EARLIER partitions of
    // the same source. The totals frame is tiny; its window is over
    // n_partitions rows per source.
    val wOff = Window.partitionBy(col("source")).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("pid"), col("source"))
      .agg(sum(col("tok")).as("psum"))
      .withColumn("off", coalesce(sum(col("psum")).over(wOff), lit(0L)))
      .select(col("pid"), col("source"), col("off"))
    withIn.join(broadcast(offsets), Seq("pid", "source"))
      .select(col("source"), col("doc_id"), col("tok"),
        ((col("off") + col("cum_in")) / lit(ctxTokens.toDouble)).cast("long")
          .as("chunk"))
  }

  /** Find training docs that contain eval-set content (shingle containment
    * |T∩E| / |E| ≥ threshold). The eval shingle set is broadcast — at any
    * corpus scale the benchmark suite stays MBs — so the training corpus
    * is scanned once with zero self-joins; the only shuffle is the
    * per-(train,eval)-pair intersection count.
    */
  def contamination(docs: DataFrame, textCol: String, idCol: String,
                    isEval: Column, n: Int = 5, threshold: Double = 0.5): DataFrame = {
    def sh(part: DataFrame, as: String) = part.select(col(idCol).as(as),
      explode(array_distinct(
        graft.functions.TextHashFunctions.hashedShingles(col(textCol), n))).as("sh"))
    val eSh = sh(docs.filter(isEval), "edoc")
    val tSh = sh(docs.filter(!isEval), "tdoc")
    val esz = eSh.groupBy("edoc").agg(count(lit(1)).as("sz"))
    tSh.join(broadcast(eSh), "sh")
      .groupBy(col("tdoc"), col("edoc"))
      .agg(count(lit(1)).as("i"))
      .join(broadcast(esz), "edoc")
      .filter(col("i") / col("sz") >= threshold)
      .select(col("edoc").as("eval_doc"), col("tdoc").as("train_doc"),
        round(col("i") / col("sz"), 6).as("containment"))
  }
}
