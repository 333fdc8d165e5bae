package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("binned range join equals the naive BETWEEN join for random data and bin sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(500) { i =>
      (i.toLong, rnd.nextLong().abs % 100000L)
    }.toDF("pid", "ts_us")
    // bins far smaller, comparable to, and far larger than interval length
    for (bin <- Seq(7L, 1000L, 9999L, 250000L)) {
      val intervals = Seq.tabulate(30) { i =>
        val s = rnd.nextLong().abs % 100000L
        (i.toLong, s, s + rnd.nextLong().abs % 20000L)
      }.toDF("interval_id", "start_us", "end_us")
      val binned = RangeJoin.binnedRangeJoin(points, intervals, bin)
        .select("pid", "interval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val naive = points.crossJoin(intervals)
        .filter(col("ts_us").between(col("start_us"), col("end_us")))
        .select("pid", "interval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned.length == binned.toSet.size, s"bin=$bin produced duplicates")
      assert(binned.toSet == naive, s"bin=$bin")
    }
  }
}
