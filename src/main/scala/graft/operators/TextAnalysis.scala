package graft.operators

import graft.{Query, Tables}
import graft.util.TextPrep._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, language identification (stopword-profile heuristic),
  * and winnowing document fingerprints (rolling min-hash).
  *
  * All four are purely per-row column pipelines — no shuffle at all except
  * the final orderBy that only exists for oracle comparison. At 100 TB these
  * run as a single whole-stage-codegen'd scan; the higher-order array
  * functions (`transform`/`filter`/`aggregate`) are Catalyst expressions,
  * not UDFs, so column pruning still reaches the parquet reader (only
  * `doc_id`+`text` are read).
  */
object TextAnalysis {

  /** Per-language stopword profiles for the lang-id heuristic. Fixed order =
    * deterministic argmax tie-break (first max wins), mirrored in the SQL.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ein", "ist", "das", "nicht"),
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "y", "de", "un", "es", "no"),
    "fr" -> Seq("le", "la", "et", "de", "un", "est", "ne"),
    "zh" -> Seq("de", "le", "shi", "he", "zai", "bu", "wo"))

  private def inList(vals: Seq[String]): String =
    vals.map("'" + _ + "'").mkString("(", ", ", ")")

  /** Token statistics: counts, type-token ratio, mean token length,
    * stopword ratio.
    */
  def tokenStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = col("_toks") // materialized once per row (see below)
    val en = langProfiles.toMap.apply("en")
    docs.withColumn("_toks", tokens(col(textCol))).select(
      col(idCol).as("doc"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_types"),
      round(size(array_distinct(toks)) * lit(1.0) / size(toks), 6).as("ttr"),
      round(aggregate(toks, lit(0L), (acc, x) => acc + length(x)) * lit(1.0) / size(toks), 6)
        .as("mean_tok_len"),
      round(size(filter(toks, x => x.isin(en: _*))) * lit(1.0) / size(toks), 6)
        .as("stopword_ratio"))
  }

  def tokenStatsOracleSql(table: String, textCol: String, idCol: String): String = {
    val t = sqlTokens(textCol)
    val en = inList(langProfiles.toMap.apply("en"))
    s"""SELECT $idCol AS doc,
          len($t) AS n_tokens,
          len(list_distinct($t)) AS n_types,
          round(len(list_distinct($t)) * 1.0 / len($t), 6) AS ttr,
          round(list_sum(list_transform($t, x -> len(x))) * 1.0 / len($t), 6) AS mean_tok_len,
          round(len(list_filter($t, x -> x IN $en)) * 1.0 / len($t), 6) AS stopword_ratio
        FROM $table"""
  }

  /** Quality score in [0,1]: blend of length band, type-token ratio and
    * stopword presence — the shape of production quality filters (exact
    * weights are engine-defined; determinism is what is verified).
    */
  /** The quality score as a plain column expression over the raw text —
    * exposed so pipeline composers (q69/q78) can FILTER inline instead of
    * computing a side frame and semi-joining it back (two extra shuffles
    * and a second corpus scan for what is a per-row predicate).
    */
  def qualityScoreExpr(text: Column): Column =
    // fused single-pass kernel ([[graft.functions.QualityScoreRaw]]) with
    // Spark's own round on top; bit-identical to the composed form
    //   round(lenScore*0.4 + least(ttr*2,1)*0.3 + least(stop*10,1)*0.3, 6)
    // (same tokenize calls, same double op order — see the kernel's
    // scaladoc; oracle gates q30/q155 hash-verify it every run)
    round(org.apache.spark.sql.GraftInterop.column(
      graft.functions.QualityScoreRaw(
        org.apache.spark.sql.GraftInterop.expression(text),
        langProfiles.toMap.apply("en"))), 6)

  def qualityKeepExpr(text: Column): Column = qualityScoreExpr(text) >= 0.5

  def qualityScore(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
      qualityScoreExpr(col(textCol)).as("quality"),
      qualityKeepExpr(col(textCol)).as("keep"))

  /** The quality score as ONE SQL scalar expression (un-rounded) — the
    * DuckDB twin of [[qualityScoreExpr]], shared by [[qualityOracleSql]]
    * and composed-pipeline oracles (q155's streamed-curation gate).
    */
  def qualityScoreSqlExpr(textCol: String): String = {
    val t = sqlTokens(textCol)
    val en = inList(langProfiles.toMap.apply("en"))
    val nTok = s"len($t)"
    val ttr = s"(len(list_distinct($t)) * 1.0 / $nTok)"
    val stop = s"(len(list_filter($t, x -> x IN $en)) * 1.0 / $nTok)"
    val lenScore = s"(CASE WHEN $nTok BETWEEN 30 AND 500 THEN 1.0 " +
      s"WHEN $nTok BETWEEN 10 AND 1000 THEN 0.5 ELSE 0.0 END)"
    s"($lenScore * 0.4 + least($ttr * 2.0, 1.0) * 0.3 + least($stop * 10.0, 1.0) * 0.3)"
  }

  /** The quality-keep gate as ONE SQL predicate ([[qualityKeepExpr]]). */
  def qualityKeepSqlExpr(textCol: String): String =
    s"(round(${qualityScoreSqlExpr(textCol)}, 6) >= 0.5)"

  /** The language guess as ONE SQL scalar expression ([[langGuessExpr]]):
    * same profiles, same first-profile-wins tie-break.
    */
  def langGuessSqlExpr(textCol: String): String = {
    val dt = s"list_distinct(${sqlTokens(textCol)})"
    val scoreExprs = langProfiles.map { case (lang, words) =>
      lang -> s"len(list_intersect($dt, ${words.map("'" + _ + "'").mkString("[", ", ", "]")}))"
    }
    val best = scoreExprs.map(_._2).mkString("greatest(", ", ", ")")
    val whens = scoreExprs.map { case (l, e) =>
      s"WHEN $e = $best AND $best > 0 THEN '$l'" }.mkString(" ")
    s"(CASE $whens ELSE 'und' END)"
  }

  def qualityOracleSql(table: String, textCol: String, idCol: String): String = {
    val score = qualityScoreSqlExpr(textCol)
    s"""SELECT $idCol AS doc, round($score, 6) AS quality,
          (round($score, 6) >= 0.5) AS keep
        FROM $table"""
  }

  /** Language id: distinct-token overlap with each profile, argmax with
    * fixed-order tie-break. Returns the guess and the winning score.
    */
  /** Language guess as a plain column expression (see [[qualityScoreExpr]]
    * for why expression-level access matters to pipeline composers).
    */
  def langGuessExpr(text: Column): Column =
    // fused single-pass kernel ([[graft.functions.LangGuess]]): the
    // composed per-profile-intersect + tie-break fold duplicated the
    // tokenization ~30× per row (every branch re-references every score
    // and `best`); the kernel computes each score once, first profile in
    // langProfiles order wins ties, 'und' when all scores are 0 —
    // bit-identical (oracle gates q29/q155 hash-verify it)
    org.apache.spark.sql.GraftInterop.column(graft.functions.LangGuess(
      org.apache.spark.sql.GraftInterop.expression(text), langProfiles))

  def langId(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val dtoks = col("_dtoks")
    val scores: Seq[(String, Column)] = langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(dtoks, array(words.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val guess = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
    // reverse fold ⇒ FIRST profile in langProfiles order wins ties
    docs.withColumn("_dtoks", array_distinct(tokens(col(textCol))))
      .select(col(idCol).as("doc"), guess.as("lang_guess"), best.as("lang_score"))
  }

  def langIdOracleSql(table: String, textCol: String, idCol: String): String = {
    val dt = s"list_distinct(${sqlTokens(textCol)})"
    val scoreExprs = langProfiles.map { case (lang, words) =>
      lang -> s"len(list_intersect($dt, ${words.map("'" + _ + "'").mkString("[", ", ", "]")}))"
    }
    val best = scoreExprs.map(_._2).mkString("greatest(", ", ", ")")
    val cases = scoreExprs.map { case (lang, s) =>
      s"WHEN $s = best AND best > 0 THEN '$lang'"
    }.mkString(" ")
    s"""WITH s AS (SELECT $idCol AS doc, $best AS best,
          ${scoreExprs.map { case (l, e) => s"$e AS sc_$l" }.mkString(", ")}
        FROM $table)
        SELECT doc,
          CASE ${langProfiles.map { case (l, _) => s"WHEN sc_$l = best AND best > 0 THEN '$l'" }.mkString(" ")}
               ELSE 'und' END AS lang_guess,
          best AS lang_score
        FROM s"""
  }

  /** Winnowing fingerprints: hash positional n-gram shingles, take the min
    * hash of every w-length window, dedupe. Standard MOSS-style scheme; two
    * docs sharing enough text share fingerprints. Emits per-doc summary
    * (count / min / max) — join fingerprints for the pair-level use.
    */
  def fingerprints(docs: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, w: Int = 4): DataFrame = {
    // shingle hashes come from the native single-loop expression; the
    // window-min lambda then sees a materialized attribute reference
    val hs = col("_hs")
    val mins = when(size(hs) >= w,
        transform(sequence(lit(0), size(hs) - w),
          i => array_min(slice(hs, i + 1, lit(w)))))
      .otherwise(when(size(hs) > 0, array(array_min(hs))).otherwise(array().cast("array<long>")))
    val fp = array_distinct(mins)
    docs
      .withColumn("_hs", graft.functions.TextHashFunctions.hashedShingles(col(textCol), n))
      .select(col(idCol).as("doc"),
        size(fp).as("n_fp"),
        array_min(fp).as("min_fp"),
        array_max(fp).as("max_fp"))
  }

  def fingerprintsOracleSql(table: String, textCol: String, idCol: String,
                            n: Int = 3, w: Int = 4): String = {
    val shs = sqlShingles(sqlTokens(textCol), n)
    s"""WITH t AS (SELECT $idCol AS doc,
          list_transform($shs, s -> ${sqlH48("s")}) AS hs FROM $table),
        m AS (SELECT doc, CASE
            WHEN len(hs) >= $w THEN list_distinct(
              list_transform(range(1, len(hs) - $w + 2), i -> list_min(hs[i:i+${w - 1}])))
            WHEN len(hs) > 0 THEN [list_min(hs)]
            ELSE [] END AS fp
          FROM t)
        SELECT doc, len(fp) AS n_fp, list_min(fp) AS min_fp, list_max(fp) AS max_fp
        FROM m"""
  }

  /** Gopher-style repetition signals: the share of a document's word
    * bigrams taken by its single most frequent bigram, and the fraction of
    * trigrams that are duplicates. Boilerplate, crawler loops and template
    * spam light both up; clean prose stays low. Like the other text ops
    * this is a pure per-row column pipeline — zero shuffle, and the
    * per-row cost is O(distinct-bigrams × bigrams) on ~60-token docs.
    */
  /** Fixed query set for q80 (literal on both engine and oracle sides).
    * 'dup' is the corpus's one rare term (df ≈ 5%), so query 0 exercises a
    * genuinely selective idf; the other two are dense-term queries where
    * length normalization decides the ranking.
    */
  val Bm25Queries: Seq[(Long, String)] = Seq(
    0L -> "dup merge",
    1L -> "spark hash join",
    2L -> "window sort stream")

  /** BM25 keyword retrieval: top-`k` docs per query, Okapi BM25 with the
    * standard k1/b. The 100 TB shape is ONE corpus scan and no inverted
    * index at all: with a literal query set, each term's tf is a per-row
    * `size(filter(tokens, _ == term))` column (codegen'd, fused into the
    * scan), corpus stats (N, avgdl, every term's document frequency) are a
    * SINGLE 1-row aggregate broadcast back, and per-query scores are plain
    * column arithmetic — so the only shuffles are the 1-row stats aggregate
    * and the final top-k. The top-k itself is the salted two-phase pattern
    * ([[Similarity.topKBruteForce]]): per-(query, salt) partial top-k, then
    * the exact top-k over `k × nSalts` survivors, so no reducer ever sees a
    * whole query's candidate list. Term contributions are summed through
    * DECIMAL(18,9), making the score — and therefore the ranking —
    * independent of partitioning and exactly reproducible in the oracle.
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queries: Seq[(Long, String)], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75, nSalts: Int = 16): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val allTerms = queries.flatMap(_._2.toLowerCase.trim.split(" +")).distinct
    val d = docs.select(col(idCol).as("doc"), tokens(col(textCol)).as("tk"))
      .select(Seq(col("doc"), size(col("tk")).cast("long").as("dl")) ++
        allTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("tk"), x => x === t)).cast("long").as(s"tf_$i")
        }: _*)
    val statCols = Seq(count(lit(1)).cast("double").as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl")) ++
      allTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = d.agg(statCols.head, statCols.tail: _*)
    def contrib(i: Int) =
      (log(lit(1) + (col("n") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5)) *
        (col(s"tf_$i") * (k1 + 1)) /
        (col(s"tf_$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
        .cast(DecimalType(18, 9))
    val qScores = queries.map { case (qid, text) =>
      val idxs = text.toLowerCase.trim.split(" +").distinct.map(allTerms.indexOf)
      struct(lit(qid).as("query_id"),
        idxs.map(contrib).reduce(_ + _).cast(DecimalType(18, 9)).as("s"))
    }
    val scored = d.crossJoin(broadcast(stats))
      .select(col("doc"), explode(array(qScores: _*)).as("qs"))
      .select(col("qs.query_id").as("query_id"), col("doc"), col("qs.s").as("s"))
      .filter(col("s") > 0)
    bm25SaltedTopK(scored, k, nSalts)
  }

  /** Shared exact salted two-phase top-k over (query_id, doc, s) scores —
    * the tail of [[bm25TopK]] and [[bm25TopKServed]], factored so the scan
    * and served forms rank through literally the same code.
    */
  private[graft] def bm25SaltedTopK(scored: DataFrame, k: Int,
                                    nSalts: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = scored.withColumn("salt",
      pmod(crc32(col("doc").cast("string")), lit(nSalts)))
    val w1 = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("s").desc, col("doc"))
    val partial = salted.withColumn("rn", row_number().over(w1))
      .filter(col("rn") <= k)
    val w2 = Window.partitionBy(col("query_id")).orderBy(col("s").desc, col("doc"))
    partial.withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc").as("doc_id"),
        round(col("s").cast("double"), 6).as("score"))
  }

  /** Persisted inverted POSTINGS index for BM25 serving — the q91/q147
    * memoized-partitioned-index pattern applied to term postings.
    * [[bm25TopK]] is the nightly-scoring shape (one corpus scan, queries
    * fused into it); a retrieval tier serving REPEATED query batches
    * should not re-tokenize the corpus per batch. The index is two parquet
    * artifacts built once per corpus:
    *  - `postings/` — one row per (term, doc): tf and the doc's length,
    *    partitioned by `tb = pmod(xxhash64(term), nBuckets)` (clustered
    *    via [[graft.PartitionedWrites.cluster]], sorted by term within
    *    files so term-predicate row-group pruning fires inside a bucket);
    *  - `stats/` — the 1-row corpus aggregate (N, avgdl).
    * A term's postings all live in its bucket, so per-term document
    * frequencies computed from the PRUNED scan are exact — no full-index
    * statistics pass at query time.
    */
  def bm25IndexFor(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                   nBuckets: Int = 64): String =
    graft.PartitionedWrites.memoizedIndex(s"bm25#$sfDir#$nBuckets") { path => {
      val toks = Tables(spark, sfDir).documents
        .select(col("doc_id").as("doc"), tokens(col("text")).as("tk"))
        .select(col("doc"), size(col("tk")).cast("long").as("dl"), col("tk"))
      toks.agg(count(lit(1)).cast("double").as("n"),
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
        .write.mode("overwrite").parquet(s"$path/stats")
      val postings = toks
        .select(col("doc"), col("dl"), explode(col("tk")).as("term"))
        .groupBy(col("term"), col("doc"), col("dl"))
        .agg(count(lit(1)).cast("long").as("tf"))
        .withColumn("tb", pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))
      graft.PartitionedWrites.cluster(postings, "tb")
        .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
    }: Unit }

  /** BM25 top-k SERVED from the persisted postings index: the query terms'
    * buckets are computed control-plane side (via the same `xxhash64`
    * expression the build used — collected, ≤ |terms| ints) and the
    * postings scan carries a literal `tb IN (…)` partition filter plus a
    * `term IN (…)` row-group filter, so serving cost is the query terms'
    * posting lists, never the corpus (PlanSpec-gates the pruning; the
    * `q80_bm25_served` study row measures growth). Exactly [[bm25TopK]]'s
    * ranking: same decimal-routed contribution arithmetic, same salted
    * top-k tail — q156 hash-matches it against q80's scan-form oracle.
    */
  def bm25TopKServed(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                     queries: Seq[(Long, String)], k: Int = 10,
                     k1: Double = 1.2, b: Double = 0.75, nSalts: Int = 16,
                     nBuckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    val root = bm25IndexFor(spark, sfDir, nBuckets)
    val allTerms = queries.flatMap(_._2.toLowerCase.trim.split(" +")).distinct
    // bucket ids via the SAME expression as the build — a driver-side
    // reimplementation of xxhash64 would silently drift
    val buckets = allTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).cast("int").as("tb"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    val post = spark.read.parquet(s"$root/postings")
      .filter(col("tb").isin(buckets: _*) && col("term").isin(allTerms: _*))
    val stats = spark.read.parquet(s"$root/stats")
    bm25ScorePostings(post, stats, queries, k, k1, b, nSalts)
  }

  /** Score + rank queries against a PRUNED postings frame `(term, doc,
    * dl, tf)` and a 1-row stats frame `(n, avgdl)` — the shared serving
    * tail of [[bm25TopKServed]] (memoized batch index) and
    * [[graft.streaming.PostingsStream]] (the DeltaView-maintained index):
    * exact per-term df from the pruned postings (a term's postings all
    * live in its bucket), the same decimal-routed contribution arithmetic
    * as [[bm25TopK]], the same salted two-phase top-k.
    */
  def bm25ScorePostings(post: DataFrame, stats: DataFrame,
                        queries: Seq[(Long, String)], k: Int = 10,
                        k1: Double = 1.2, b: Double = 0.75,
                        nSalts: Int = 16): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = post.sparkSession
    import spark.implicits._
    val dfs = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib =
      (log(lit(1) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
        (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
        .cast(DecimalType(18, 9))
    val qt = queries.flatMap { case (qid, text) =>
      text.toLowerCase.trim.split(" +").distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    val scored = post.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .join(broadcast(qt), "term")
      .groupBy(col("query_id"), col("doc"))
      .agg(sum(contrib).cast(DecimalType(18, 9)).as("s"))
      .filter(col("s") > 0)
    bm25SaltedTopK(scored, k, nSalts)
  }

  /** DuckDB twin of [[bm25TopK]]: same single-pass tf columns, 1-row stats,
    * decimal-routed per-term contributions, plain-window top-k (the salted
    * two-phase top-k is exact, so the sequential window is its oracle).
    */
  def bm25OracleSql(table: String, textCol: String, idCol: String,
                    queries: Seq[(Long, String)], k: Int = 10,
                    k1: Double = 1.2, b: Double = 0.75): String =
    s"""
      WITH ${bm25OracleCtes(table, textCol, idCol, queries, k1, b)}
      SELECT query_id, rank, doc AS doc_id,
             round(CAST(s AS DOUBLE), 6) AS score
      FROM r WHERE rank <= $k
      ORDER BY query_id, rank"""

  /** [[bm25OracleSql]]'s CTE chain alone (`dd`/`st`/`sc`/`r`; `r` carries
    * the per-query rank) — a composable FRAGMENT, so the hybrid-retrieval
    * oracle (q162) ranks through literally the q80/q156 scoring SQL.
    */
  def bm25OracleCtes(table: String, textCol: String, idCol: String,
                     queries: Seq[(Long, String)],
                     k1: Double = 1.2, b: Double = 0.75): String = {
    val allTerms = queries.flatMap(_._2.toLowerCase.trim.split(" +")).distinct
    val tfCols = allTerms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(tk, x -> x = '$t')) AS BIGINT) AS tf_$i"
    }.mkString(",\n")
    val dfCols = allTerms.indices.map(i =>
      s"SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i").mkString(",\n")
    def contrib(i: Int) =
      s"""CAST(ln(1 + (st.n - st.df_$i + 0.5) / (st.df_$i + 0.5)) *
          (tf_$i * ${k1 + 1}) /
          (tf_$i + $k1 * (${1 - b} + $b * dl / st.avgdl)) AS DECIMAL(18,9))"""
    val branches = queries.map { case (qid, text) =>
      val idxs = text.toLowerCase.trim.split(" +").distinct.map(allTerms.indexOf)
      s"""SELECT CAST($qid AS BIGINT) AS query_id, doc,
            CAST(${idxs.map(contrib).mkString(" + ")} AS DECIMAL(18,9)) AS s
          FROM dd, st"""
    }.mkString("\nUNION ALL\n")
    s"""dd AS (
        SELECT $idCol AS doc, CAST(len(tk) AS BIGINT) AS dl,
               $tfCols
        FROM (SELECT $idCol, ${sqlTokens(textCol)} AS tk FROM $table)),
      st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                    $dfCols
             FROM dd),
      sc AS ($branches),
      r AS (SELECT query_id, doc, s,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY s DESC, doc) AS rank
            FROM sc WHERE s > 0)"""
  }

  /** Iterative BPE tokenizer TRAINING: `rounds` synchronized merge steps.
    * q89 computes only the FIRST merge (the argmax pair); a tokenizer-
    * training pipeline runs the LOOP — apply the winning merge to the
    * token stream, recount adjacent pairs, repeat — and its output is the
    * ordered merge table (round, pair, cnt) that defines the tokenizer.
    *
    * Semantics (the standard character-BPE contract):
    *  - the unit of training is the word TYPE with its occurrence count —
    *    pair counts are Σ n_occ, so per-round work is O(vocab), not
    *    O(corpus): the corpus is scanned ONCE to build the weighted
    *    vocabulary and never again (the classic Sennrich et al. 2016
    *    implementation trick, and the 100 TB term: vocabulary is bounded
    *    by the heavy-tailed type distribution, not data volume);
    *  - training words are `^[a-z0-9]+$` types of length ≥ 2 (symbols
    *    never contain the encoding delimiter, and 1-symbol words can
    *    never produce a pair);
    *  - each round's merge is the (cnt DESC, pair ASC) argmax — ONE row
    *    collected to the driver per round (control-plane, the
    *    [[Similarity.kmeansCentroids]] loop-state policy);
    *  - applying a merge is GREEDY LEFT-TO-RIGHT and non-overlapping
    *    within a word ("aaa" under merge (a,a) → ["aa","a"]).
    *
    * The greedy apply is ONE codegen'd string `replace` per round, via the
    * delimiter encoding `"ab" → "|a||b|"`: merging pair (x,y) is literally
    * `replace(s, "|x||y|", "|xy|")`, and string replace IS left-to-right
    * non-overlapping in both engines — consecutive occurrences merge
    * ("|a||b||a||b|" → "|ab||ab|") while a symbol whose SUFFIX matches x
    * cannot false-match ("|xa||b|" does not contain "|a||b|"). Vocabulary
    * state localCheckpoints per round so lineage never nests (the q85
    * cadence); the merged frame is vocab-sized, so the checkpoint is
    * cheap and self-releasing.
    *
    * The DuckDB oracle ([[bpeOracleSql]]) is machine-generated unrolled
    * CTEs (the q126/q132 pattern) replaying the same encoding, the same
    * argmax tie-break and the same replace — counts are exact integers,
    * so the full merge table hash-matches.
    */
  def bpeTrainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainRaw(docs, textCol, rounds)
      .map { case (r, p, c) => (r, p.replace("||", " ").replace("|", ""), c) }
      .toDF("round", "pair", "cnt")
      .orderBy(col("round"))
  }

  /** The training loop itself, returning merges in DELIMITER form
    * (`"|x||y|"`) — the form [[bpeEncodeCounts]] replays verbatim.
    */
  private def bpeTrainRaw(docs: DataFrame, textCol: String,
                          rounds: Int): Seq[(Int, String, Long)] = {
    var w = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$") && length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("n"))
      .select(regexp_replace(col("w"), "(.)", "|$1|").as("s"), col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      // symbols from the encoded state; the array is MATERIALIZED into a
      // named column before the pair HOF references it per element
      // (TextPrep.shingles' projection-boundary contract)
      val syms = split(col("s").substr(lit(2), length(col("s")) - 2), "\\|\\|")
      val top = w.select(col("n"), syms.as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("n"), explode(transform(
          sequence(lit(1), size(col("a")) - 1),
          i => concat(lit("|"), element_at(col("a"), i), lit("||"),
            element_at(col("a"), i + 1), lit("|")))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true // corpus out of pairs: stop early
      else {
        val pair = top(0).getString(0)
        merges += ((r, pair, top(0).getLong(1)))
        w = w.select(replace(col("s"), lit(pair),
            lit(pair.replace("||", ""))).as("s"), col("n"))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** ENCODE the corpus under a trained merge table — the serving side of
    * [[bpeTrainMerges]], and the number a training-mix planner actually
    * budgets with: per-document token count under the tokenizer the
    * corpus itself trained.
    *
    * Scale shape: training is vocab-sized (see [[bpeTrainMerges]]); the
    * encode is ONE map-only whole-stage-codegen projection over the
    * corpus — each doc's words char-delimiter-encode inside a single
    * `transform`, join on a space separator (a pair string is always
    * `"|x||y|"` with alnum x/y, so the `"| |"` at a word boundary can
    * never match one — merges cannot cross words by construction), then
    * the `rounds` trained merges apply as a chain of codegen'd string
    * `replace`s in rank order, and the final token count is pipes/2 (every
    * surviving symbol is wrapped `|…|`). No explode, no shuffle, no join:
    * at 100 TB this is scan-bound, embarrassingly parallel, and the
    * R-deep replace chain is the whole-stage-codegen span the plan shows.
    *
    * Tokens outside the trained alphabet (`^[a-z0-9]+$`; the training
    * filter) are ATOMIC: they encode as one un-mergeable symbol `"|_|"`
    * ("_" is outside every pair's alphabet) and contribute exactly 1 —
    * the byte-fallback convention, collapsed to a single symbol. The
    * DuckDB oracle replays encoding, merge order and the replace
    * semantics bit-exactly (both engines' `replace` is left-to-right
    * non-overlapping).
    */
  def bpeEncodeCounts(docs: DataFrame, textCol: String, idCol: String,
                      rounds: Int): DataFrame =
    docs.select(col(idCol).as("doc"),
      bpeCountCol(col(textCol), bpeTrainPairs(docs, textCol, rounds))
        .as("bpe_tokens"))

  /** Train `rounds` merges and return them in delimiter form (`"|x||y|"`)
    * — the model a [[bpeCountCol]] projection replays. Control-plane
    * sized: one ~R-row Seq, the shape the mix planner ships to every
    * scan task as literals.
    */
  def bpeTrainPairs(docs: DataFrame, textCol: String, rounds: Int): Seq[String] =
    bpeTrainRaw(docs, textCol, rounds).map(_._2)

  /** The per-row BPE token count under a trained merge table, as ONE
    * codegen'd column (see [[bpeEncodeCounts]] for the encoding
    * contract) — reusable by any operator that budgets in tokenizer
    * tokens (q165 encode, q167 mix allocation) without a join against
    * an encoded frame.
    */
  def bpeCountCol(text: Column, mergePairs: Seq[String]): Column = {
    val enc = array_join(transform(tokens(text), w =>
      when(w.rlike("^[a-z0-9]+$"), regexp_replace(w, "(.)", "|$1|"))
        .otherwise(lit("|_|"))), " ")
    val merged = mergePairs.foldLeft(enc)((s, p) =>
      replace(s, lit(p), lit(p.replace("||", ""))))
    ((length(merged) - length(replace(merged, lit("|"), lit(""))))
      .cast("long") / 2).cast("long")
  }

  /** DuckDB twin of [[bpeEncodeCounts]]: the [[bpeOracleSql]] merge-table
    * CTE chain (m1..mR), then the same single-projection encode — per-doc
    * words char-encode / atomize, space-join, the R merges replace in
    * rank order via scalar subqueries, count = pipes/2.
    */
  def bpeEncodeOracleSql(table: String, textCol: String, idCol: String,
                         rounds: Int): String =
    s"""WITH ${bpeEncodeCtes(table, textCol, idCol, rounds)}
        SELECT doc, CAST((len(s) - len(replace(s, '|', ''))) // 2 AS BIGINT)
          AS bpe_tokens
        FROM e$rounds ORDER BY doc"""

  /** The [[bpeEncodeOracleSql]] CTE chain alone (training m1..mR plus the
    * encode stages e0..eR; `e<rounds>` holds `(doc, s)` with `s` the
    * fully-merged delimiter encoding) — so a composing oracle (q167's
    * mix allocation) can budget over the encoded corpus without
    * restating the machinery.
    */
  def bpeEncodeCtes(table: String, textCol: String, idCol: String,
                    rounds: Int): String = {
    val init = s"""w0 AS MATERIALIZED (
        SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(${sqlTokens(textCol)}) AS w FROM $table)
        WHERE regexp_matches(w, '^[a-z0-9]+$$') AND len(w) >= 2
        GROUP BY w)"""
    val steps = (1 to rounds).map { r =>
      val apply =
        if (r == rounds) ""
        else s""",
          w$r AS MATERIALIZED (
            SELECT replace(s, (SELECT pair FROM m$r),
                     (SELECT replace(pair, '||', '') FROM m$r)) AS s, n
            FROM w${r - 1})"""
      s"""a$r AS (SELECT string_split(substr(s, 2, len(s) - 2), '||') AS a, n
                  FROM w${r - 1}),
          p$r AS (SELECT unnest(list_transform(range(1, len(a)),
                    i -> '|' || a[i] || '||' || a[i + 1] || '|')) AS pair, n
                  FROM a$r),
          m$r AS MATERIALIZED (
            SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt
            FROM p$r GROUP BY pair
            ORDER BY cnt DESC, pair LIMIT 1)$apply"""
    }.mkString(",\n")
    val encSteps = (1 to rounds).map { r =>
      // CASE-guarded: a round past pair exhaustion has an empty m_r, whose
      // scalar subquery is NULL — replace(s, NULL, NULL) would NULL the
      // whole doc while the engine just applies fewer merges
      s"""e$r AS (SELECT doc,
                    CASE WHEN (SELECT COUNT(*) FROM m$r) = 0 THEN s
                    ELSE replace(s, (SELECT pair FROM m$r),
                      (SELECT replace(pair, '||', '') FROM m$r)) END AS s
                  FROM e${r - 1})"""
    }.mkString(",\n")
    s"""$init,
        $steps,
        e0 AS (SELECT $idCol AS doc,
                 array_to_string(list_transform(${sqlTokens(textCol)},
                   w -> CASE WHEN regexp_matches(w, '^[a-z0-9]+$$')
                     THEN regexp_replace(w, '(.)', '|\\1|', 'g')
                     ELSE '|_|' END), ' ') AS s
               FROM $table),
        $encSteps"""
  }

  /** DuckDB twin of [[bpeTrainMerges]]: machine-generated unrolled CTEs,
    * one (pair-count argmax, replace-apply) stage per round. MATERIALIZED
    * stops DuckDB's CTE inlining from exponentiating the base scans
    * (each w_r is referenced by two CTEs of round r+1 — the q126 rule).
    */
  def bpeOracleSql(table: String, textCol: String, rounds: Int): String = {
    val init = s"""w0 AS MATERIALIZED (
        SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(${sqlTokens(textCol)}) AS w FROM $table)
        WHERE regexp_matches(w, '^[a-z0-9]+$$') AND len(w) >= 2
        GROUP BY w)"""
    val steps = (1 to rounds).map { r =>
      val apply =
        if (r == rounds) "" // the final round's merged state is unused
        else s""",
          w$r AS MATERIALIZED (
            SELECT replace(s, (SELECT pair FROM m$r),
                     (SELECT replace(pair, '||', '') FROM m$r)) AS s, n
            FROM w${r - 1})"""
      s"""a$r AS (SELECT string_split(substr(s, 2, len(s) - 2), '||') AS a, n
                  FROM w${r - 1}),
          p$r AS (SELECT unnest(list_transform(range(1, len(a)),
                    i -> '|' || a[i] || '||' || a[i + 1] || '|')) AS pair, n
                  FROM a$r),
          m$r AS MATERIALIZED (
            SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt
            FROM p$r GROUP BY pair
            ORDER BY cnt DESC, pair LIMIT 1)$apply"""
    }.mkString(",\n")
    val branches = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS INTEGER) AS round,
            replace(replace(pair, '||', ' '), '|', '') AS pair, cnt
          FROM m$r"""
    }.mkString("\nUNION ALL\n")
    s"""WITH $init,
        $steps
        SELECT round, pair, cnt FROM ($branches) ORDER BY round"""
  }

  def repetitionSignals(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val bi = col("_bi")
    val tri = col("_tri")
    // Max bigram multiplicity via sort + one linear run-length fold —
    // O(T log T) per row. The previous `array_max(transform(
    // array_distinct(bi), g => size(filter(bi, _ === g))))` re-scanned
    // the bigram array once per DISTINCT gram: O(T²) element compares
    // per document, the measured bulk of this row's cost. The fold's
    // `best` is the same integer count, so the rounded fraction is
    // bit-identical.
    val maxMult = aggregate(
      sort_array(bi),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(1L)
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))
    docs.withColumn("_toks", tokens(col(textCol)))
      .withColumn("_bi", shingles(col("_toks"), 2))
      .withColumn("_tri", shingles(col("_toks"), 3))
      .select(
        col(idCol).as("doc"),
        round(when(size(bi) > 0, maxMult * lit(1.0) / size(bi))
          .otherwise(0.0), 6).as("top_bigram_frac"),
        round(when(size(tri) > 0,
          (size(tri) - size(array_distinct(tri))) * lit(1.0) / size(tri))
          .otherwise(0.0), 6).as("dup_trigram_frac"))
  }

  def repetitionOracleSql(table: String, textCol: String, idCol: String): String = {
    val bi = sqlShingles(sqlTokens(textCol), 2)
    val tri = sqlShingles(sqlTokens(textCol), 3)
    s"""WITH g AS (SELECT $idCol AS doc, $bi AS bi, $tri AS tri FROM $table)
        SELECT doc,
          round(CASE WHEN len(bi) > 0 THEN
              list_max(list_transform(list_distinct(bi),
                g -> len(list_filter(bi, x -> x = g)))) * 1.0 / len(bi)
            ELSE 0.0 END, 6) AS top_bigram_frac,
          round(CASE WHEN len(tri) > 0 THEN
              (len(tri) - len(list_distinct(tri))) * 1.0 / len(tri)
            ELSE 0.0 END, 6) AS dup_trigram_frac
        FROM g"""
  }

  // ------------------------------------------------------------ query corpus

  /** Corpus-LM quality scoring: score every document against a unigram
    * model LEARNED FROM THE CORPUS ITSELF — the two-pass shape of
    * production quality filters (CCNet's LM perplexity filter, Gopher's
    * frequency heuristics): pass 1 aggregates token document frequencies,
    * pass 2 scores each token occurrence by how common its token is and
    * how much of the doc falls outside the learned vocabulary.
    *
    * Per doc: `lm_commonness` = mean df-fraction of its in-vocab token
    * occurrences (high = fluent/common language, low = gibberish), and
    * `oov_rate` = fraction of occurrences whose token fell below the
    * `minDf` vocabulary cut.
    *
    * Scale shape: pass 1 is one map-side-combinable shuffle (distinct
    * tokens per doc → `groupBy(token).count`); the vocabulary (bounded by
    * the `minDf` cut — production vocabs are ~100k entries) broadcasts to
    * pass 2's occurrence scan, which re-aggregates per doc in one more
    * shuffle. The corpus-size scalar rides a 1-row broadcast cross join
    * (q80's pattern), never a driver round-trip. Engine-exactness: df sums
    * are INTEGER sums (exact at any partitioning); division happens once
    * per doc, after the sums.
    *
    * `carry` columns (e.g. `source`) pass through the per-doc aggregate so
    * callers don't need a join to recover them.
    */
  def lmScore(docs: DataFrame, textCol: String, idCol: String,
              minDf: Int = 5, carry: Seq[String] = Nil): DataFrame = {
    val occ = docs.select(
      (col(idCol).as("doc") +: carry.map(col) :+
        explode(tokens(col(textCol))).as("tok")): _*)
    val vocab = docs
      .select(col(idCol).as("doc"),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val nDocs = docs.agg(count(lit(1)).as("n_corpus"))
    occ.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy((col("doc") +: carry.map(col)): _*)
      .agg(count(lit(1)).as("n_occ"), count(col("df")).as("n_in"),
        coalesce(sum(col("df")), lit(0L)).as("s_df"))
      .crossJoin(broadcast(nDocs))
      .select((col("doc") +: carry.map(col) :+ col("n_occ") :+
        when(col("n_in") > 0,
          round(col("s_df") * lit(1.0) / (col("n_in") * col("n_corpus")), 6))
          .otherwise(0.0).as("lm_commonness") :+
        round((col("n_occ") - col("n_in")) * lit(1.0) / col("n_occ"), 6)
          .as("oov_rate")): _*)
  }

  /** Per-document TF-IDF keyword extraction: the top `topK` tokens of each
    * document by `tf · idf`, the corpus-statistics counterpart of the
    * per-query retrieval ranking ([[bm25TopK]] ranks DOCS for a query; this
    * ranks TOKENS for a doc — the tagging/labeling op of a curation
    * pipeline).
    *
    * Determinism across engines: idf is rounded ONCE to integer micro-nats
    * (`round(ln((N+1)/(df+1))·1e6)` — both engines ln() the same exact
    * integer ratio, the [[Curation.dsirWeights]] trick), so every score is
    * an exact BIGINT product `tf · idf_micro` and the per-doc ranking is
    * bit-reproducible regardless of partitioning; ties break by token.
    *
    * 100 TB shape: two map-side-combinable aggregates (tf over (doc, token),
    * df over token), a vocabulary-sized idf table that broadcasts into the
    * score join, and a per-doc top-k window whose partitions are document
    * islands (bounded by doc length — no global or skewed partition
    * anywhere). N is a corpus scalar a stored corpus already has; here it
    * is computed once and embedded as a literal.
    */
  def tfIdfKeywords(docs: DataFrame, textCol: String, idCol: String,
                    topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfTab = toks.distinct().groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.count()
    val idf = dfTab.withColumn("idf_micro",
      round(log((lit(n) + lit(1.0)) / (col("df") + lit(1.0))) * 1e6).cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("tok"))
    tf.join(broadcast(idf), "tok")
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("tok").as("token"),
        col("tf"), col("score_micro"))
  }

  val queries: Seq[Query] = Seq(
    Query(
      "q29_text_token_stats",
      Some(tokenStatsOracleSql("documents", "text", "doc_id") + " ORDER BY doc"))(
      (spark, dir) =>
        tokenStats(Tables(spark, dir).documents, "text", "doc_id").orderBy("doc")),

    Query(
      "q30_text_quality",
      Some(qualityOracleSql("documents", "text", "doc_id") + " ORDER BY doc"))(
      (spark, dir) =>
        qualityScore(Tables(spark, dir).documents, "text", "doc_id").orderBy("doc")),

    Query(
      "q31_text_langid",
      Some(langIdOracleSql("documents", "text", "doc_id") + " ORDER BY doc"))(
      (spark, dir) =>
        langId(Tables(spark, dir).documents, "text", "doc_id").orderBy("doc")),

    Query(
      "q32_text_fingerprint",
      Some(fingerprintsOracleSql("documents", "text", "doc_id") + " ORDER BY doc"))(
      (spark, dir) =>
        fingerprints(Tables(spark, dir).documents, "text", "doc_id").orderBy("doc")),

    Query(
      "q54_text_repetition",
      Some(repetitionOracleSql("documents", "text", "doc_id") + " ORDER BY doc"))(
      (spark, dir) =>
        repetitionSignals(Tables(spark, dir).documents, "text", "doc_id").orderBy("doc")),

    // Map-function coverage (§2.3 array/map/JSON row): a per-doc token →
    // count MAP built with map_from_entries, then queried through
    // map_keys / element_at / map_contains_key. The oracle recomputes the
    // same VALUES from the token list directly — the map is the engine's
    // representation under test, not part of the output schema.
    Query(
      "q64_map_fns",
      Some(s"""
        SELECT doc_id AS doc,
               len(list_distinct(t)) AS n_types,
               len(list_filter(t, x -> x = 'the')) AS n_the,
               list_contains(t, 'data') AS has_data
        FROM (SELECT doc_id, ${sqlTokens("text")} AS t FROM documents)
        ORDER BY doc"""))((spark, dir) => {
      val m = col("_m")
      Tables(spark, dir).documents
        .withColumn("_toks", tokens(col("text")))
        .withColumn("_m", map_from_entries(
          transform(array_distinct(col("_toks")),
            t => struct(t, size(filter(col("_toks"), x => x === t))))))
        .select(col("doc_id").as("doc"),
          size(map_keys(m)).as("n_types"),
          coalesce(element_at(m, "the"), lit(0)).as("n_the"),
          map_contains_key(m, "data").as("has_data"))
        .orderBy(col("doc"))
    }),

    // BPE-style token counting: the pretokenizer split every byte-pair
    // tokenizer starts from — runs of letters, runs of digits, single
    // punctuation marks (an RE2/Java-portable simplification of the GPT-2
    // pattern, which needs lookahead). The chars-per-token ratio is the
    // budget metric every training pipeline tracks next to the whitespace
    // token count (q29). Per-row regex, zero shuffle, codegen.
    Query(
      "q77_bpe_tokens",
      Some(s"""
        SELECT doc_id AS doc,
               len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                 AS n_bpe,
               len(${sqlTokens("text")}) AS n_ws,
               round(n_chars * 1.0 /
                 len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')),
                 4) AS chars_per_tok
        FROM documents ORDER BY doc"""))((spark, dir) => {
      val re = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
      val nBpe = regexp_count(lower(col("text")), lit(re))
      Tables(spark, dir).documents
        .select(col("doc_id").as("doc"),
          nBpe.cast("long").as("n_bpe"),
          size(tokens(col("text"))).cast("long").as("n_ws"),
          round(col("n_chars") / nBpe, 4).as("chars_per_tok"))
        .orderBy(col("doc"))
    }),

    // BM25 keyword retrieval: top-10 docs for three fixed queries (one
    // carrying the corpus's only rare term, 'dup'). The query-term slice of
    // the inverted index is the only thing materialized; decimal-routed
    // contribution sums make the ranking engine-exact.
    Query(
      "q80_bm25",
      Some(bm25OracleSql("documents", "text", "doc_id", Bm25Queries)))(
      (spark, dir) => {
        bm25TopK(Tables(spark, dir).documents, "text", "doc_id", Bm25Queries)
          .orderBy(col("query_id"), col("rank"))
      }),

    // BM25 SERVED from the persisted postings index (build memoized
    // outside the query, the retrieval-tier shape): the oracle is q80's
    // full-scan form, so the hash match proves the partition-pruned
    // postings path returns bit-identical rankings to the corpus scan.
    Query(
      "q156_bm25_served",
      Some(bm25OracleSql("documents", "text", "doc_id", Bm25Queries)))(
      (spark, dir) => {
        bm25TopKServed(spark, dir, Bm25Queries)
          .orderBy(col("query_id"), col("rank"))
      }),

    // The STREAMED postings maintainer end-to-end (the q158/q159
    // convention on the text-retrieval modality): bootstrap batch 0
    // inserts every doc_id % 10 != 0; batch 1 DELETES every doc_id % 7
    // == 0 and INSERTS every doc_id % 10 == 0 in the SAME signed batch —
    // deletes apply first, so a doc that is both re-enters (the
    // delete-then-reinsert contract) and the surviving corpus is exactly
    // NOT(doc_id % 7 = 0 AND doc_id % 10 <> 0). Serving then answers the
    // fixed q80 query set from the MAINTAINED index; the oracle is the
    // from-scratch scan-form BM25 over the surviving corpus — stats, df,
    // scores and ranking all hash-equal, proving maintained ≡ rebuilt
    // through inserts, takedowns and same-batch reinsertion.
    Query(
      "q160_bm25_stream_commit",
      Some(bm25OracleSql(
        "(SELECT * FROM documents WHERE NOT (doc_id % 7 = 0 AND doc_id % 10 <> 0))",
        "text", "doc_id", Bm25Queries)))((spark, dir) => {
      import graft.streaming.PostingsStream
      val d = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
      val root = java.nio.file.Files
        .createTempDirectory("graft-q160").toString
      PostingsStream.applySignedBatchDelta(spark, root,
        d.filter(col("doc_id") % 10 =!= 0)
          .select(lit("I").as("op"), col("doc_id"), col("text")),
        batchId = 0L)
      PostingsStream.applySignedBatchDelta(spark, root,
        d.filter(col("doc_id") % 7 === 0)
          .select(lit("D").as("op"), col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 10 === 0)
            .select(lit("I").as("op"), col("doc_id"), col("text"))),
        batchId = 1L)
      PostingsStream.bm25TopKDelta(spark, root, Bm25Queries)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Per-doc TF-IDF keywords: top-3 tokens of every document, scores as
    // exact BIGINT tf·idf_micro products so the ranking hash-matches.
    Query(
      "q130_tfidf_keywords",
      Some(s"""
        WITH toks AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS tok
                      FROM documents),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT tok, COUNT(*) AS df
               FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (SELECT doc_id, tok, tf,
                     tf * CAST(round(ln((n + 1.0) / (df + 1.0)) * 1000000)
                               AS BIGINT) AS score_micro
                   FROM tf JOIN df USING (tok) CROSS JOIN n),
        r AS (SELECT doc_id, tok, tf, score_micro,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_micro DESC, tok) AS rank
              FROM scored)
        SELECT doc_id, rank, tok AS token, tf, score_micro
        FROM r WHERE rank <= 3
        ORDER BY doc_id, rank"""))((spark, dir) => {
      tfIdfKeywords(Tables(spark, dir).documents, "text", "doc_id", topK = 3)
        .orderBy(col("doc_id"), col("rank"))
    }),

    // PII scrubbing — the redaction pass a training pipeline runs before
    // text reaches a model. The synthetic corpus carries no PII, so each
    // doc first gets 1 + (doc_id % 3) deterministic contact addresses
    // APPENDED (same construction in both engines — the injection is part
    // of the fixture, the scrub is the operator under test), then emails
    // are redacted to <EMAIL>. Per-row regex pipeline: zero shuffles,
    // whole-stage codegen, column-pruned scan. The scrubbed text is
    // compared by md5 so the oracle row stays narrow. (DuckDB's
    // regexp_replace needs the 'g' flag to match Spark's replace-all.)
    Query(
      "q73_pii_scrub",
      Some(s"""
        WITH pii AS (
          SELECT doc_id,
                 text || ' ' || array_to_string(
                   list_transform(range(1, (doc_id % 3) + 2),
                     i -> 'user' || doc_id || '-' || i || '@example.com'),
                   ' ') AS t
          FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(t, '[a-z0-9-]+@[a-z]+\\.[a-z]+')) AS n_emails,
               md5(regexp_replace(t, '[a-z0-9-]+@[a-z]+\\.[a-z]+', '<EMAIL>', 'g')) AS scrub_md5
        FROM pii ORDER BY doc_id"""))((spark, dir) => {
      val emailRe = "[a-z0-9-]+@[a-z]+\\.[a-z]+"
      val pii = concat(col("text"), lit(" "),
        concat_ws(" ", transform(
          sequence(lit(1), (col("doc_id") % 3 + 1).cast("int")),
          i => concat(lit("user"), col("doc_id").cast("string"), lit("-"),
            i.cast("string"), lit("@example.com")))))
      Tables(spark, dir).documents
        .select(col("doc_id"),
          regexp_count(pii, lit(emailRe)).as("n_emails"),
          md5(regexp_replace(pii, emailRe, "<EMAIL>").cast("binary")).as("scrub_md5"))
        .orderBy(col("doc_id"))
    }),

    // Corpus-LM quality: learn a unigram model from the corpus (pass 1),
    // score every doc against it (pass 2). Doc scores land in [0,1]; the
    // per-source roll-up sums them through DECIMAL(18,6) so the aggregate
    // is exact at any partition count (q81's pattern).
    Query(
      "q83_lm_quality",
      Some(s"""
        WITH occ AS (SELECT doc_id AS doc, source,
                       unnest(${sqlTokens("text")}) AS tok
                     FROM documents),
        vocab AS (SELECT tok, COUNT(*) AS df
                  FROM (SELECT DISTINCT doc, tok FROM occ)
                  GROUP BY tok HAVING COUNT(*) >= 5),
        n AS (SELECT COUNT(*) AS n_corpus FROM documents),
        per AS (SELECT o.doc, o.source, COUNT(*) AS n_occ,
                       COUNT(v.df) AS n_in, COALESCE(SUM(v.df), 0) AS s_df
                FROM occ o LEFT JOIN vocab v USING (tok)
                GROUP BY o.doc, o.source),
        sc AS (SELECT source,
                 CASE WHEN n_in > 0
                      THEN round(s_df * 1.0 / (n_in * n_corpus), 6)
                      ELSE 0.0 END AS lm_commonness,
                 round((n_occ - n_in) * 1.0 / n_occ, 6) AS oov_rate
               FROM per CROSS JOIN n)
        SELECT source, COUNT(*) AS n_docs,
               round(CAST(SUM(CAST(lm_commonness AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_commonness,
               round(CAST(SUM(CAST(oov_rate AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_oov
        FROM sc GROUP BY source ORDER BY source"""))((spark, dir) => {
      val d6 = org.apache.spark.sql.types.DecimalType(18, 6)
      lmScore(Tables(spark, dir).documents, "text", "doc_id",
          minDf = 5, carry = Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("lm_commonness").cast(d6)).cast("double")
            / count(lit(1)), 6).as("avg_commonness"),
          round(sum(col("oov_rate").cast(d6)).cast("double")
            / count(lit(1)), 6).as("avg_oov"))
        .orderBy(col("source"))
    }),

    // The first merge step of BPE tokenizer TRAINING: count adjacent
    // character pairs across all word occurrences and rank — the argmax
    // is the pair BPE would merge first. One explode → one map-side-
    // combinable count shuffle → TakeOrderedAndProject; at 100 TB the
    // pair alphabet is tiny (≤ charset²), so the final top-k is cheap.
    Query(
      "q89_bpe_merge",
      Some(s"""
        WITH w AS (SELECT unnest(${sqlTokens("text")}) AS w FROM documents),
        p AS (SELECT unnest(list_transform(range(1, len(w)),
                i -> substr(w, i, 2))) AS pair
              FROM w WHERE len(w) >= 2)
        SELECT pair, COUNT(*) AS cnt
        FROM p GROUP BY pair
        ORDER BY cnt DESC, pair LIMIT 20"""))((spark, dir) => {
      Tables(spark, dir).documents
        .select(explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(transform(
          sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(20)
    }),

    // Collocation mining: adjacent word bigrams ranked by LIFT
    // (n_pair·N / (n_w1·n_w2)) — the PMI family with the log dropped so
    // every quantity stays an exact integer until ONE final division
    // (engine-exact, no transcendental drift). Two map-side-combinable
    // count shuffles + a join of bigrams to unigram counts; the corpus
    // token total rides a 1-row broadcast cross join.
    Query(
      "q100_collocations",
      Some(s"""
        WITH toks AS (SELECT unnest(${sqlTokens("text")}) AS w FROM documents),
        uni AS (SELECT w, COUNT(*) AS cw FROM toks GROUP BY w),
        n AS (SELECT COUNT(*) AS n_toks FROM toks),
        bg AS (SELECT unnest(${sqlShingles(sqlTokens("text"), 2)}) AS b
               FROM documents),
        bgc AS (SELECT b, COUNT(*) AS cb FROM bg GROUP BY b HAVING COUNT(*) >= 20),
        j AS (SELECT bgc.b, bgc.cb, u1.cw AS c1, u2.cw AS c2
              FROM bgc
              JOIN uni u1 ON u1.w = split_part(bgc.b, ' ', 1)
              JOIN uni u2 ON u2.w = split_part(bgc.b, ' ', 2))
        SELECT b AS bigram, cb AS n_pair,
               round(cb * 1.0 * n_toks / (c1 * 1.0 * c2), 6) AS lift
        FROM j CROSS JOIN n
        ORDER BY lift DESC, bigram LIMIT 20"""))((spark, dir) => {
      val docs = Tables(spark, dir).documents
      // one corpus scan feeds the unigram table; the token TOTAL is just
      // sum(cw) over it — no second pass. MATERIALIZE the token array
      // before shingling: `shingles` is a HOF whose lambda references its
      // input per element, so passing the raw `tokens(text)` expression
      // re-ran the split O(tokens) times per row (CollapseProject will
      // not inline a non-cheap multi-referenced alias, so the projection
      // boundary is load-bearing)
      val toksDf = docs.select(tokens(col("text")).as("_t"))
      val uni = toksDf.select(explode(col("_t")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw")).cache()
      val nToks = uni.agg(sum(col("cw")).as("n_toks"))
      val bgc = toksDf
        .select(explode(shingles(col("_t"), 2)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("cb"))
        .filter(col("cb") >= 20)
        .withColumn("w1", split(col("b"), " ").getItem(0))
        .withColumn("w2", split(col("b"), " ").getItem(1))
      bgc
        .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
        .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
        .crossJoin(broadcast(nToks))
        .select(col("b").as("bigram"), col("cb").as("n_pair"),
          round(col("cb") * lit(1.0) * col("n_toks")
            / (col("c1") * lit(1.0) * col("c2")), 6).as("lift"))
        .orderBy(col("lift").desc, col("bigram")).limit(20)
    }),

    // Iterative BPE tokenizer training, 8 synchronized merge rounds (q89
    // is round 1's argmax only): the ordered merge table, hash-matched
    // against a machine-generated unrolled-CTE oracle replaying the same
    // greedy left-to-right merge apply. See bpeTrainMerges for the
    // O(vocab)-per-round scale contract.
    Query(
      "q161_bpe_train",
      Some(bpeOracleSql("documents", "text", rounds = 8)))((spark, dir) =>
      bpeTrainMerges(Tables(spark, dir).documents, "text", rounds = 8)),

    // BPE ENCODING under the trained tokenizer — the serving side of
    // q161 and the per-doc token budget a mix planner reads: train 8
    // merges on the corpus, then encode the whole corpus in ONE map-only
    // codegen projection (words char-encode inside a transform, space
    // join, 8 chained replaces, count = pipes/2 — no explode, no
    // shuffle). Non-alphabet tokens are atomic (1 token each).
    Query(
      "q165_bpe_encode",
      Some(bpeEncodeOracleSql("documents", "text", "doc_id", rounds = 8)))(
      (spark, dir) =>
        bpeEncodeCounts(Tables(spark, dir).documents, "text", "doc_id",
            rounds = 8)
          .orderBy(col("doc"))),

    // The streamed postings index SERVED with a compacted base AND live
    // uncompacted deltas — the steady-state read plan: base_v0 is the
    // bootstrap corpus (compacted, tb-partitioned), batches 1 and 2
    // (takedowns + same-batch reinserts) stay live deltas at
    // compactEvery=3, so the serve FOLDS base+deltas with tb/term
    // pruning on the base scan (PlanSpec-gated). Unlike q160 (which
    // times the commit lifecycle), the maintained state is memoized
    // per (sfDir) so this row's time IS the fold+prune serve cost —
    // the tripwire now guards that plan's shape and volume. The oracle
    // is the from-scratch scan-form BM25 over the surviving corpus:
    //   live = (all \ {d%7=0 ∧ d%10≠0}) \ {d%5=0} ∪ {d%15=0}
    // (batch 2 deletes every d%5=0 and reinserts d%15=0 in the same
    // signed batch — deletes-first, so the reinserts re-enter).
    Query(
      "q163_bm25_stream_serve",
      Some(bm25OracleSql(
        SteadyStatePostingsCorpusSql, "text", "doc_id", Bm25Queries)))(
      (spark, dir) => {
      import graft.streaming.PostingsStream
      PostingsStream.bm25TopKDelta(spark,
          steadyStatePostingsRoot(spark, dir), Bm25Queries)
        .orderBy(col("query_id"), col("rank"))
    })
  )

  /** The q163 steady-state maintained postings index — compacted base_v0
    * plus two LIVE uncompacted deltas (takedowns + same-batch reinserts
    * at compactEvery=3) — memoized per sf dir so q163 and the streamed
    * hybrid fusion (q166) serve from literally the same state. Surviving
    * corpus ≡ [[SteadyStatePostingsCorpusSql]].
    */
  def steadyStatePostingsRoot(spark: org.apache.spark.sql.SparkSession,
                              dir: String): String = {
    import graft.streaming.PostingsStream
    graft.PartitionedWrites.memoizedIndex(s"q163#$dir") { path =>
      val d = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
      PostingsStream.applySignedBatchDelta(spark, path,
        d.filter(col("doc_id") % 10 =!= 0)
          .select(lit("I").as("op"), col("doc_id"), col("text")),
        batchId = 0L, compactEvery = 3) // first commit = compacted base_v0
      PostingsStream.applySignedBatchDelta(spark, path,
        d.filter(col("doc_id") % 7 === 0)
          .select(lit("D").as("op"), col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 10 === 0)
            .select(lit("I").as("op"), col("doc_id"), col("text"))),
        batchId = 1L, compactEvery = 3) // live delta_v1
      PostingsStream.applySignedBatchDelta(spark, path,
        d.filter(col("doc_id") % 5 === 0)
          .select(lit("D").as("op"), col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 15 === 0)
            .select(lit("I").as("op"), col("doc_id"), col("text"))),
        batchId = 2L, compactEvery = 3) // live delta_v2
    }
  }

  /** The documents surviving [[steadyStatePostingsRoot]]'s lifecycle, as
    * a DuckDB subquery — the corpus every oracle over that index scores.
    */
  def SteadyStatePostingsCorpusSql: String = // def: evaluated inside the
    // eager `queries` init above, which runs BEFORE a val here would set
    """(SELECT * FROM documents
        WHERE (NOT (doc_id % 7 = 0 AND doc_id % 10 <> 0)
               AND doc_id % 5 <> 0)
           OR doc_id % 15 = 0)"""
}
