package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per SURVEY.md §2
  * operator); `oracleSql` gives the DuckDB-equivalent SQL for every
  * SQL-expressible query. Column aliases match on both sides — the driver
  * sorts columns by name and hashes values.
  */
object SparkEntry {

  private val modules: Seq[Query] =
    graft.operators.Relational.queries ++
    graft.operators.RelationalExt.queries ++
    graft.operators.Dedup.queries ++
    graft.operators.EmbeddingIndex.queries ++
    graft.operators.TextAnalysis.queries ++
    graft.operators.Similarity.queries ++
    graft.operators.HybridRetrieval.queries ++
    graft.operators.Multimodal.queries ++
    graft.operators.Pipeline.queries ++
    graft.operators.RangeJoin.queries ++
    graft.operators.ScaleOps.queries ++
    graft.operators.ScaleOps.extraQueries ++
    graft.operators.Curation.queries ++
    graft.operators.ZOrder.queries ++
    graft.operators.Warehouse.queries ++
    graft.operators.Graph.queries ++
    graft.operators.TimeSeries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Query.toMaps(modules)._1

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  val oracleSql: Map[String, String] = Query.toMaps(modules)._2
}
