package graft

import org.apache.spark.sql.types._

/** Pins the loaded schema of EVERY test table, not just events.
  *
  * Round 7's only defect was silent generator drift (events.ts changed
  * precision and 13 oracle queries errored at verify time). EventsSchemaSpec
  * closed that one column; this spec closes the rest of the surface: any
  * regeneration that renames a column, changes a numeric width, or flips an
  * array element type now fails ONE test that names the exact table and
  * column, instead of a scatter of downstream query errors.
  *
  * Deliberately pins the schema as seen THROUGH `Tables.byName` — the
  * engine's own read path, post-adaptation — because that is the contract
  * every operator compiles against. Dtype classes operators genuinely
  * depend on:
  *   - integer key columns (joins, key-shifted GenScale replication),
  *   - `embedding` element type float (cosine arithmetic, Similarity),
  *   - `text`/`lang` as string (shingling, langid),
  *   - temporal columns as TIMESTAMP_NTZ (windows, sessionization, date
  *     arithmetic — the generator writes dates as timestamp[us] and the
  *     oracle reads the same files, so NTZ is the shared ground truth).
  */
class TablesSchemaSpec extends SparkSpec {

  private def fields(name: String): Map[String, DataType] =
    Tables(spark, sf()).byName(name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  private def assertCols(table: String, want: (String, DataType)*): Unit = {
    val got = fields(table)
    want.foreach { case (c, dt) =>
      assert(got.contains(c), s"$table: expected column '$c', has ${got.keys.toSeq.sorted}")
      assert(got(c) == dt, s"$table.$c: expected $dt, loaded ${got(c)} — " +
        "generator vintage change; adapt Tables or update this pin")
    }
  }

  test("star-schema key and measure columns hold their dtypes") {
    assertCols("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertCols("nation", "n_nationkey" -> IntegerType,
      "n_regionkey" -> IntegerType, "n_name" -> StringType)
    assertCols("customer", "c_custkey" -> LongType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    assertCols("supplier", "s_suppkey" -> LongType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    assertCols("part", "p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType, "p_brand" -> StringType)
    assertCols("orders", "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderstatus" -> StringType)
    assertCols("lineitem", "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_shipdate" -> TimestampNTZType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType)
  }

  test("extension tables hold their dtypes (events post-adaptation)") {
    assertCols("events", "event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
    assertCols("documents", "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
    val emb = fields("embeddings")
    assertCols("embeddings", "vec_id" -> LongType)
    emb("embedding") match {
      case ArrayType(FloatType, _) => ()
      case other => fail(s"embeddings.embedding: expected array<float>, " +
        s"loaded $other — Similarity's cosine arithmetic assumes float")
    }
  }
}
