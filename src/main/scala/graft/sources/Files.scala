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

  /** Raw-file ingest (Spark's built-in `binaryFile` source): one row per
    * file with (path, modificationTime, length, content) — the REAL entry
    * point of a media pipeline, where payloads live as loose objects in a
    * bucket before any table exists. `pathGlob` filters server-side
    * (`pathGlobFilter`, e.g. `*.png`), so non-matching objects are never
    * opened; the returned frame feeds the fingerprint/decode operators
    * directly (content IS the payload column). At 100 TB the source
    * parallelizes by file; pack tiny files upstream (the small-files tax
    * is a storage-layout concern, not an engine one) and project
    * metadata-only columns where possible — `content` prunes like any
    * other column.
    */
  def readBinaryFiles(spark: SparkSession, path: String,
                      pathGlob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob).load(path)

  /** Whole-line text read (`text` source): one row per line, the shape
    * raw crawl dumps arrive in. Schema-free by nature (single `value`
    * string column).
    */
  def readTextLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
