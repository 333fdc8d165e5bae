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

  private def attrEvents(rows: Seq[(Long, String, Double, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "value", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
  }

  test("touchAttribution: first/last touch, window cutoff, unattributed row") {
    // u1: click -> view -> purchase (both in window): (click, view).
    // u2: purchase with no touch at all -> (null, null).
    // u3: click a hair OLDER than 24h -> also (null, null).
    val day = 86400000000L
    val got = ScaleOps.touchAttribution(attrEvents(Seq(
        (1L, "click", 0.0, 1000000L), (1L, "view", 0.0, 2000000L),
        (1L, "purchase", 10.5, 3000000L),
        (2L, "purchase", 2.0, 1000000L),
        (3L, "click", 0.0, 0L), (3L, "purchase", 1.0, day + 1000000L))),
        touchTypes = Seq("click", "view"), convType = "purchase",
        windowUs = day)
      .collect().map(r => (r.getAs[String]("first_touch"),
        r.getAs[String]("last_touch"), r.getAs[Long]("n_purchases"),
        r.getAs[Long]("revenue_micro"))).toSet
    assert(got == Set(("click", "view", 1L, 10500000L),
      (null, null, 2L, 3000000L)))
  }

  test("touchAttribution: a touch at the conversion's exact instant counts; equal-instant ties decode deterministically") {
    // click and view share the purchase's own microsecond: the RANGE frame
    // includes both; first = click (lower code), last = view (higher code).
    val got = ScaleOps.touchAttribution(attrEvents(Seq(
        (1L, "click", 0.0, 5000000L), (1L, "view", 0.0, 5000000L),
        (1L, "purchase", 1.0, 5000000L))),
        touchTypes = Seq("click", "view"), convType = "purchase",
        windowUs = 86400000000L)
      .collect().map(r => (r.getAs[String]("first_touch"),
        r.getAs[String]("last_touch"), r.getAs[Long]("n_purchases"))).toSeq
    assert(got == Seq(("click", "view", 1L)))
  }

  test("touchAttribution: touches never cross users") {
    // u1's click must not attribute u2's purchase.
    val got = ScaleOps.touchAttribution(attrEvents(Seq(
        (1L, "click", 0.0, 1000000L),
        (2L, "purchase", 1.0, 2000000L))),
        touchTypes = Seq("click", "view"), convType = "purchase",
        windowUs = 86400000000L)
      .collect().map(r => (r.getAs[String]("first_touch"),
        r.getAs[String]("last_touch"))).toSeq
    assert(got == Seq((null, null)))
  }

  test("touchAttribution is partitioning-independent") {
    val types = Seq("click", "view", "purchase", "error")
    val ev = attrEvents((1L to 500L).map(i =>
      (i % 13, types((i * 7 % 4).toInt), (i % 5).toDouble, i * 1000000L)))
    def run(d: org.apache.spark.sql.DataFrame) =
      ScaleOps.touchAttribution(d, Seq("click", "view"), "purchase",
          windowUs = 60000000L)
        .orderBy(asc_nulls_first("first_touch"), asc_nulls_first("last_touch"))
        .collect().toSeq
    val a = run(ev)
    assert(a == run(ev.repartition(9)) && a.nonEmpty)
  }
}
