package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("interleave2 round-trips known bit patterns") {
    import spark.implicits._
    // bx=0b101, by=0b011 -> z bits: x at even, y at odd positions
    //   b0: x=1->1, y=1->2 ; b1: x=0, y=1->8 ; b2: x=1->16, y=0
    val out = Seq((5L, 3L)).toDF("bx", "by")
      .select(ZOrder.interleave2(col("bx"), col("by"), 3).as("z"))
      .head().getLong(0)
    assert(out == (1 + 2 + 8 + 16))
  }

  test("z-ordered files are narrow in BOTH dimensions; linear sort is not") {
    val li = Tables(spark, sf()).lineitem
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val zPath = "/tmp/graft-test/zorder-li"
    val linPath = "/tmp/graft-test/linear-li"
    val nFiles = 8
    val n = ZOrder.zorderWrite(li, "l_partkey", "l_suppkey", zPath, nFiles)
    assert(n == nFiles, s"expected $nFiles files, wrote $n")
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linPath)

    // the layout must not lose or duplicate rows
    val a = spark.read.parquet(zPath).groupBy().agg(
      count(lit(1)), sum("l_partkey"), sum("l_suppkey")).head()
    val b = li.groupBy().agg(
      count(lit(1)), sum("l_partkey"), sum("l_suppkey")).head()
    assert(a == b)

    // mean per-file extent of each dim, normalized by the full range
    def meanExtents(path: String): (Double, Double) = {
      val df = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("l_partkey") - min("l_partkey")).cast("double").as("xe"),
          (max("l_suppkey") - min("l_suppkey")).cast("double").as("ye"))
        .agg(avg("xe"), avg("ye")).head()
      val full = li.agg(
        (max("l_partkey") - min("l_partkey")).cast("double"),
        (max("l_suppkey") - min("l_suppkey")).cast("double")).head()
      (df.getDouble(0) / full.getDouble(0), df.getDouble(1) / full.getDouble(1))
    }
    val (zx, zy) = meanExtents(zPath)
    val (lx, ly) = meanExtents(linPath)
    // linear sort: x prunes hard, y files span ~the full range
    assert(lx < 0.35, s"linear x extent $lx")
    assert(ly > 0.85, s"linear y extent $ly")
    // z-order: BOTH dims narrow — each file covers a compact 2-D tile
    assert(zx < 0.65, s"zorder x extent $zx")
    assert(zy < 0.65, s"zorder y extent $zy")
  }

  test("zorder key is deterministic under repartitioning") {
    val li = Tables(spark, sf()).lineitem
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    // compare the multiset of (inputs -> key) instead of a row-id map.
    def keys(d: DataFrame): Map[(Long, Long, Long), Long] = {
      val stats = d.agg(
        min(col("l_partkey")).cast("long").as("_xmin"),
        max(col("l_partkey")).cast("long").as("_xmax"),
        min(col("l_suppkey")).cast("long").as("_ymin"),
        max(col("l_suppkey")).cast("long").as("_ymax"))
      d.crossJoin(broadcast(stats))
        .select(col("l_partkey").cast("long"), col("l_suppkey").cast("long"),
          ZOrder.zorderKey2(col("l_partkey"), col("l_suppkey"),
            col("_xmin"), col("_xmax"), col("_ymin"), col("_ymax")).as("z"))
        .collect()
        .groupBy(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .map { case (k, rs) => k -> rs.length.toLong }
    }
    assert(keys(li) == keys(li.repartition(13)))
  }
}
