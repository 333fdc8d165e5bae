package graft.streaming

import graft.SparkSpec
import graft.streaming.StatefulDedup.Keyed
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StatefulDedupSpec extends SparkSpec {

  test("first occurrence per key survives across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sd").toString

    val mem = MemoryStream[Keyed]
    val q = StatefulDedup.run(spark, mem.toDS(), s"$dir/ckpt", "dedup_out")

    mem.addData(Keyed("a", 3), Keyed("a", 1), Keyed("b", 2))
    q.processAllAvailable()
    // duplicate key in a LATER batch must be suppressed by state
    mem.addData(Keyed("a", 9), Keyed("c", 7))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L), ("b", 2L), ("c", 7L)), out)
  }

  test("transformWithState progress monitor accumulates per-table counts and watermarks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.ProgressMonitor.{Applied, Progress}
    val dir = java.nio.file.Files.createTempDirectory("graft-pm").toString
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Applied]
      val q = ProgressMonitor.progress(spark, mem.toDS())
        .writeStream.format("memory").queryName("pm_out")
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      mem.addData(Applied("nation", 3), Applied("nation", 7), Applied("orders", 5))
      q.processAllAvailable()
      mem.addData(Applied("nation", 9))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("pm_out").as[Progress].collect()
      // last emission per table carries the running totals across batches
      val last = out.groupBy(_.table).map { case (t, rows) =>
        t -> rows.maxBy(_.totalEvents) }
      assert(last("nation") == Progress("nation", 3, 9, 1), last("nation"))
      assert(last("orders") == Progress("orders", 1, 5, 1), last("orders"))
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("MapState + ListState activity monitor: bounded recent buffer, per-kind counts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.ActivityMonitor.{Activity, Ev}
    val dir = java.nio.file.Files.createTempDirectory("graft-am").toString
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val q = graft.streaming.ActivityMonitor.activity(spark, mem.toDS(), keepK = 3)
        .writeStream.format("memory").queryName("am_out")
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      mem.addData(Ev("u1", "view", 1.0), Ev("u1", "view", 2.0), Ev("u1", "click", 3.0))
      q.processAllAvailable()
      // 4 more values for u1: recent buffer must hold only the LAST 3
      mem.addData(Ev("u1", "view", 10.0), Ev("u1", "buy", 20.0),
        Ev("u1", "view", 30.0), Ev("u2", "view", 7.0))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("am_out").as[Activity].collect()
        .groupBy(_.user).map { case (u, rows) => u -> rows.maxBy(_.totalEvents) }
      assert(last("u1") == Activity("u1", 3, 6, 60.0), last("u1")) // 10+20+30
      assert(last("u2") == Activity("u2", 1, 1, 7.0), last("u2"))
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("event-time timers close sessions exactly when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.SessionTimers.{Ev, Session}
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-st").toString
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val withWm = mem.toDS().withWatermark("ts", "0 seconds")
      val q = graft.streaming.SessionTimers.sessions(spark, withWm, gapMs = 60000L)
        .writeStream.format("memory").queryName("st_out")
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      // batch 1: two users; batch 2 only advances the watermark a little —
      // no session may close; batch 3 pushes the watermark past both gaps.
      mem.addData(Ev("a", ts("2026-01-01 10:00:00"), 1.0),
        Ev("a", ts("2026-01-01 10:00:30"), 2.0),
        Ev("b", ts("2026-01-01 10:00:10"), 5.0))
      q.processAllAvailable()
      mem.addData(Ev("c", ts("2026-01-01 10:01:00"), 9.0))
      q.processAllAvailable()
      val early = spark.table("st_out").as[Session].collect()
      assert(early.isEmpty, s"sessions closed before the watermark: ${early.toSeq}")
      mem.addData(Ev("c", ts("2026-01-01 10:10:00"), 1.0))
      q.processAllAvailable()
      // one more batch so timers registered at the last watermark fire
      mem.addData(Ev("c", ts("2026-01-01 10:20:00"), 1.0))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("st_out").as[Session].collect().map(s => s.user -> s).toMap
      assert(out.contains("a") && out.contains("b"), s"missing sessions: $out")
      assert(out("a").nEvents == 2 && out("a").totalValue == 3.0, out("a"))
      assert(out("a").startMs == ts("2026-01-01 10:00:00").getTime)
      assert(out("a").endMs == ts("2026-01-01 10:00:30").getTime)
      assert(out("b").nEvents == 1 && out("b").totalValue == 5.0, out("b"))
      // c's session is still open: its gap has not been passed by the watermark
      assert(!out.contains("c"), out.get("c").toString)
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flatMapGroupsWithState session emitter closes sessions on gap") {
    // Batch-mode execution of the same stateful function: state starts
    // empty, timeouts never fire, so exactly the gap-CLOSED sessions are
    // emitted (the open tail stays in discarded state). The streaming
    // plumbing itself (checkpointed state across micro-batches) is proven
    // by the dedup test above.
    import spark.implicits._
    import graft.streaming.StatefulDedup.{Ev, Session}
    val in = Seq(
      Ev(1, 1000), Ev(1, 1500), Ev(1, 1900), // session 1 (closed by the gap)
      Ev(1, 7000), Ev(1, 7100),              // session 2 (still open -> not emitted)
      Ev(2, 500), Ev(2, 5000), Ev(2, 5100)   // user 2: first session closed
    ).toDS()
    val closed = StatefulDedup.sessionEmitter(spark, in, gapMs = 1000)
      .collect().toSet
    assert(closed == Set(Session(1, 1000, 1900, 3), Session(2, 500, 500, 1)))
  }

  test("TopKAggregator equals window top-k") {
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(3).toColumn
    val data = Seq(
      (1L, 0.9, 10L), (1L, 0.8, 11L), (1L, 0.9, 9L), (1L, 0.1, 12L), (1L, 0.5, 13L),
      (2L, 0.3, 20L), (2L, 0.7, 21L))
      .toDF("q", "score", "id")
    val viaAgg = data.as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.name("topk"))
      .collect().toMap
      .map { case (k, v) => k -> v.map(_._2) }
    // expected: score desc, id asc tiebreak
    assert(viaAgg(1L) == Seq(9L, 10L, 11L))
    assert(viaAgg(2L) == Seq(21L, 20L))
  }
}
