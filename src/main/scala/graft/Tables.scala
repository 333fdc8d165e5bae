package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Accessors for the driver-generated test tables (see /root/repo/TESTDATA.md).
  *
  * One parquet file per table under a scale-factor directory. All reads go
  * through `spark.read.parquet` so Catalyst's vectorized parquet reader,
  * predicate pushdown and column pruning apply; at cluster scale the same
  * code reads a directory of many files, so nothing here assumes a single
  * file.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** `events.ts` is nanosecond-precision parquet, which Spark's vectorized
    * reader rejects (PARQUET_TYPE_ILLEGAL). Read it as a nanos long
    * (legacy conf) and truncate to microsecond TIMESTAMP_NTZ — exactly what
    * DuckDB does when it casts TIMESTAMP_NS to TIMESTAMP, so oracle results
    * align. Integer `DIV` (not `/`, which is double division and loses
    * precision at epoch-nanos magnitude) keeps the truncation exact.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast(TimestampNTZType))
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** All star-schema + extension tables, in a stable order. */
  def all: Seq[(String, DataFrame)] = Tables.names.map {
    case "events" => "events" -> events
    case n        => n -> table(n)
  }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
