package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File source/sink surface (SURVEY.md §2.3 scans/sinks row): parquet is
  * the engine's native format (columnar, vectorized reader, pushdown);
  * ORC gets the same treatment from Spark; CSV/JSON are interchange
  * formats — schema-explicit reads only (schema inference is a full extra
  * pass over 100 TB and non-deterministic under sampling).
  */
object Files {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-explicit CSV read (header respected, no inference pass). */
  def readCsv(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).option("header", "true").csv(path)

  /** Schema-explicit JSON-lines read. */
  def readJson(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(path)

  /** Schema-explicit XML read (built-in datasource since Spark 4.0);
    * `rowTag` names the per-record element.
    */
  def readXml(spark: SparkSession, path: String, ddl: String,
              rowTag: String): DataFrame =
    spark.read.schema(ddl).option("rowTag", rowTag).xml(path)

  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).xml(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
