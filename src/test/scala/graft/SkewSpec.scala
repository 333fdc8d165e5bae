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
