package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible) an
  * equivalent ANSI SQL string the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases must match between the two — the driver's
  * comparator sorts columns by name and hashes values.
  */
final case class Query(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

object Query {
  /** Assemble driver-contract maps from a list of queries. */
  def toMaps(qs: Seq[Query])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val fns = qs.map(q => q.name -> q.run).toMap
    val sql = qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
    (fns, sql)
  }
}
