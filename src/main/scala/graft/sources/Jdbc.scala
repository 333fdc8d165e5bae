package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink — the engine's equivalent of the reference's two
  * HiveServer2 JDBC endpoints (`/root/reference/env.sh:4-5`, every beeline
  * call in `beeline_functions.sh`). The reference forks a beeline JVM and
  * awk-parses stdout; the engine reads/writes typed DataFrames over the
  * same wire protocol.
  *
  * Scale rules encoded here:
  *  - reads are PARTITIONED (`partitionColumn`/bounds/`numPartitions`) so N
  *    executors issue N range-disjoint queries instead of one connection
  *    streaming the whole table through the driver;
  *  - Catalyst pushes filters and column pruning into the generated SQL
  *    (`PushedFilters` visible in the scan node), so `WHERE`/`SELECT`
  *    reach the remote database;
  *  - writes batch inserts (`batchsize`) and parallelize per partition.
  */
object Jdbc {

  /** Partitioned parallel read of `table`, split on `partCol` ∈ [lo, hi]. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partCol: String, lo: Long, hi: Long, numPartitions: Int,
                      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partCol, lo, hi, numPartitions, props)

  /** Single-connection read (small reference tables only). */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Parallel batched write. `colTypes` (Spark's `createTableColumnTypes`
    * form: `"name VARCHAR(128), score DOUBLE"`) overrides the dialect's
    * default column DDL for created tables — e.g. comparable VARCHAR
    * instead of Derby's CLOB default for strings.
    */
  def write(df: DataFrame, url: String, table: String,
            mode: String = "overwrite", batchSize: Int = 1000,
            props: Properties = new Properties(),
            colTypes: Option[String] = None): Unit = {
    props.setProperty("batchsize", batchSize.toString)
    colTypes.foreach(props.setProperty("createTableColumnTypes", _))
    df.write.mode(mode).jdbc(url, table, props)
  }
}
