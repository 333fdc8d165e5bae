package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("markovTransitions: hand sequences produce the exact matrix") {
    import spark.implicits._
    // user 1: A B A C ; user 2: B A  →  A→B:1, B→A:2, A→C:1
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "C"),
      (2L, 5L, "B"), (2L, 6L, "A"))
      .toDF("user_id", "event_id", "et")
      .withColumn("ts", timestamp_millis(col("event_id") * 1000))
    val got = ScaleOps.markovTransitions(ev, col("user_id"), col("et"),
        Seq(col("ts"), col("event_id")))
      .orderBy("src", "dst").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(("A", "B", 1L, 0.5), ("A", "C", 1L, 0.5),
      ("B", "A", 2L, 1.0)))
  }

  test("markovTransitions: equal timestamps resolve by the event_id tie-break") {
    import spark.implicits._
    // Both orderings of (B, C) after A share one timestamp; event_id must
    // decide, so the matrix is A→B, B→C — never A→C.
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"))
      .toDF("user_id", "event_id", "et")
      .withColumn("ts", timestamp_millis(lit(1000)))
    val got = ScaleOps.markovTransitions(ev, col("user_id"), col("et"),
        Seq(col("ts"), col("event_id")))
      .select("src", "dst").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("A", "B"), ("B", "C")))
  }

  test("markovTransitions is partitioning-independent") {
    import spark.implicits._
    val ev = (1L to 200L).map(i => (i % 7, i, s"e${i % 3}"))
      .toDF("user_id", "event_id", "et")
      .withColumn("ts", timestamp_millis(col("event_id") * 250))
    val a = ScaleOps.markovTransitions(ev, col("user_id"), col("et"),
      Seq(col("ts"), col("event_id"))).orderBy("src", "dst").collect().toSeq
    val b = ScaleOps.markovTransitions(ev.repartition(9), col("user_id"),
      col("et"), Seq(col("ts"), col("event_id"))).orderBy("src", "dst")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("eventPaths: hand sequences, paths never cross users") {
    import spark.implicits._
    // user 1: A B C B -> paths A>B>C, B>C>B; user 2: C B A -> C>B>A.
    // A cross-user window would also fabricate B>C>B across the boundary.
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"), (1L, 4L, "B"),
        (2L, 5L, "C"), (2L, 6L, "B"), (2L, 7L, "A"))
      .toDF("user_id", "event_id", "et")
      .withColumn("ts", timestamp_millis(col("event_id") * 100))
    val got = ScaleOps.eventPaths(ev, col("user_id"), col("et"),
        Seq(col("ts"), col("event_id")), steps = 3, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A>B>C" -> 1L, "B>C>B" -> 1L, "C>B>A" -> 1L))
  }

  test("eventPaths is partitioning-independent (incl. the top-k cut)") {
    import spark.implicits._
    val ev = (1L to 400L).map(i => (i % 11, i, s"e${(i * 7) % 5}"))
      .toDF("user_id", "event_id", "et")
      .withColumn("ts", timestamp_millis(col("event_id") * 250))
    def run(d: org.apache.spark.sql.DataFrame) =
      ScaleOps.eventPaths(d, col("user_id"), col("et"),
        Seq(col("ts"), col("event_id")), steps = 3, topK = 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val a = run(ev)
    assert(a == run(ev.repartition(9)) && a.size == 5)
  }
}
