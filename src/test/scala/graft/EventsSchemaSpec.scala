package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins the on-disk dtype of `events.ts` AND proves `Tables.events` adapts.
  *
  * The driver has regenerated /root/testdata with different timestamp
  * precisions across rounds (nanos-as-long in r1–r6, timestamp[us] in r7).
  * A vintage change must fail HERE, loudly, instead of erroring 13 oracle
  * queries at verify time. If this test fails, check the raw dtype below
  * and confirm `Tables.events` has a branch for it.
  */
class EventsSchemaSpec extends SparkSpec {

  test("raw events.ts dtype is a known vintage (long-nanos or timestamp)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"${sf()}/events.parquet")
    val dt = raw.schema("ts").dataType
    assert(
      dt == LongType || dt == TimestampNTZType || dt == TimestampType,
      s"events.ts loaded as $dt — new generator vintage; teach Tables.events about it")
  }

  test("Tables.events normalizes ts to TIMESTAMP_NTZ and reads rows") {
    val ev = Tables(spark, sf()).events
    assert(ev.schema("ts").dataType == TimestampNTZType)
    assert(ev.limit(1).count() == 1)
  }
}
