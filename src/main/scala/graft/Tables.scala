package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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

  /** `events.ts` has shipped in two vintages: nanosecond-precision parquet
    * (which Spark's vectorized reader rejects — PARQUET_TYPE_ILLEGAL — so we
    * read it as a nanos long via the legacy conf and truncate to microsecond
    * TIMESTAMP_NTZ, matching DuckDB's TIMESTAMP_NS→TIMESTAMP cast) and plain
    * microsecond TIMESTAMP_NTZ. Adapt on the LOADED dtype, not an assumed
    * vintage: integral ⇒ nanos path (integer `DIV`, not `/` — double division
    * loses precision at epoch-nanos magnitude); timestamp ⇒ just normalize to
    * TIMESTAMP_NTZ. EventsSchemaSpec pins the current vintage so a generator
    * change fails one obvious test instead of every events query.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table("events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast(TimestampNTZType))
      case TimestampNTZType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampNTZType))
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Table by name through its ADAPTING accessor where one exists — the
    * single dispatch point for vintage-sensitive reads (events), so callers
    * seeding "all tables" can never bypass the adaptation by name.
    */
  def byName(name: String): DataFrame = name match {
    case "events" => events
    case n        => table(n)
  }

  /** All star-schema + extension tables, in a stable order. */
  def all: Seq[(String, DataFrame)] = Tables.names.map(n => n -> byName(n))
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
