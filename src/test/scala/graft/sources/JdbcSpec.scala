package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** JDBC round trip against embedded Derby (the in-container stand-in for
  * the reference's HiveServer2 endpoints).
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("write + partitioned read round-trips and pushes filters down") {
    val supplier = Tables(spark, sf()).supplier
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    Jdbc.write(supplier, url, "supplier")

    val n = supplier.count()
    val maxKey = supplier.agg(max("s_suppkey")).head().getLong(0)
    val back = Jdbc.readPartitioned(spark, url, "supplier",
      "s_suppkey", 0, maxKey, numPartitions = 4)
    assert(back.count() == n)
    assert(back.rdd.getNumPartitions == 4)

    // row-level equality
    val a = supplier.collect().map(_.toString).toSet
    val b = back.collect().map(_.toString).toSet
    assert(a == b)

    // filter pushdown reaches the JDBC scan
    val filtered = back.filter(col("s_nationkey") === 3).select("s_suppkey", "s_acctbal")
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("EqualTo(s_nationkey,3)"), scan)
    val expect = supplier.filter(col("s_nationkey") === 3).count()
    assert(filtered.count() == expect)
  }

  test("jdbc sink append mode accumulates") {
    val region = Tables(spark, sf()).region
    Jdbc.write(region, url, "region2")
    Jdbc.write(region, url, "region2", mode = "append")
    assert(Jdbc.read(spark, url, "region2").count() == region.count() * 2)
  }
}
