package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.util.Skew

/** Contract tests for the skew utilities: salted forms must be row-for-row
  * identical to their unsalted equivalents, including null edge cases.
  */
class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain join even when saltFrom is null") {
    import spark.implicits._
    // key 1 is "hot"; one of its rows has a NULL salt source — before the
    // coalesce fix that row silently vanished from the join.
    val probe = Seq(
      (1, Option(10L)), (1, Option(11L)), (1, None), (2, Option(12L)), (3, None)
    ).toDF("k", "salt_src")
    val build = Seq((1, "a"), (2, "b"), (4, "d")).toDF("bk", "v")

    val plain = probe.join(build, col("k") === col("bk"))
      .orderBy("k", "salt_src").collect().toSeq
    val salted = Skew.saltedJoin(probe, build, col("k"), col("bk"),
        saltFrom = col("salt_src"), n = 4)
      .orderBy("k", "salt_src").collect().toSeq
    assert(salted == plain)
    assert(plain.count(_.getInt(0) == 1) == 3, "null-salt row must survive")
  }

  test("saltedJoin refuses inputs that already carry the temp column") {
    import spark.implicits._
    val probe = Seq((1, 0)).toDF("k", "_graft_salt_p")
    val build = Seq((1, "a")).toDF("bk", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, col("k"), col("bk"), col("k"), 4)
    }
  }

  test("AQE splits a skewed join partition at runtime (automatic saltedJoin)") {
    import spark.implicits._
    // One giant key on the probe side. With the skew thresholds forced low
    // AQE must mark the partition skewed and split it across tasks — the
    // runtime counterpart of the plan-time salting in Skew.saltedJoin.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val probe = spark.range(300000)
        .select((col("id") % 50).as("k"), col("id").as("payload"))
        .withColumn("k", when(col("k") < 25, 1L).otherwise(col("k"))) // hot key 1
      val build = (0L until 50L).toDF("bk")
      val joined = probe.join(build, col("k") === col("bk"))
      // execute THIS frame (count() would plan a separate query) and read
      // the finalized adaptive plan
      assert(joined.collect().length == 300000)
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"), s"AQE skew split missing:\n${plan.take(2000)}")
    } finally old.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("saltedAggregate matches direct groupBy for algebraic aggregates") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 3, i.toLong)).toDF("k", "x")
    val direct = df.groupBy("k").agg(sum("x").as("sx"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAggregate(df, Seq("k"), col("x"), 8,
        partial = Seq(sum("x").as("sx"), count(lit(1)).as("n")),
        merge = Seq(sum("sx").as("sx"), sum("n").as("n")))
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }
}
