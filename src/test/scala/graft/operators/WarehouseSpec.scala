package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("scd2: compacts consecutive duplicates and chains valid_from/valid_to") {
    import spark.implicits._
    // key 1: A@10, A@20 (compacted), B@30, A@40 -> 3 versions.
    // key 2: single observation -> one open version.
    val ch = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"), (2L, 15L, 5L, "Z")
    ).toDF("k0", "ts", "tb", "a")
    val v = Warehouse.scd2(ch, col("k0"), col("ts"), col("tb"), col("a"))
      .orderBy("k", "version").collect()
    assert(v.map(r => (r.getAs[Long]("k"), r.getAs[String]("segment"),
      r.getAs[Long]("valid_from"), Option(r.getAs[Any]("valid_to")),
      r.getAs[Int]("version"), r.getAs[Boolean]("is_current"))).toSeq == Seq(
      (1L, "A", 10L, Some(30L), 1, false),
      (1L, "B", 30L, Some(40L), 2, false),
      (1L, "A", 40L, None, 3, true),
      (2L, "Z", 15L, None, 1, true)))
  }

  test("scd2 is null-safe: to/from-null transitions version; null runs compact") {
    import spark.implicits._
    // key 1: A, null, null (compacted), A  -> versions A, null, A.
    // key 2: starts null, then B           -> versions null, B.
    val ch = Seq(
      (1L, 10L, 1L, Some("A")), (1L, 20L, 2L, None), (1L, 30L, 3L, None),
      (1L, 40L, 4L, Some("A")), (2L, 5L, 5L, None), (2L, 15L, 6L, Some("B"))
    ).toDF("k0", "ts", "tb", "a")
    val v = Warehouse.scd2(ch, col("k0"), col("ts"), col("tb"), col("a"))
      .orderBy("k", "version").collect()
      .map(r => (r.getAs[Long]("k"), Option(r.getAs[String]("segment")),
        r.getAs[Long]("valid_from"), r.getAs[Int]("version")))
    assert(v.toSeq == Seq(
      (1L, Some("A"), 10L, 1), (1L, None, 20L, 2), (1L, Some("A"), 40L, 3),
      (2L, None, 5L, 1), (2L, Some("B"), 15L, 2)))
  }

  test("heavyHitters probes string keys with string hashing") {
    import spark.implicits._
    val df = (Seq.fill(80)("alpha") ++ Seq.fill(90)("beta") ++
      (1 to 500).map(i => s"rare$i")).toDF("name")
    val got = Warehouse.heavyHitters(df, "name", 75L, eps = 1e-3)
      .orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("alpha", 80L), ("beta", 90L)))
  }

  test("scd2 + pitJoin: lookup lands in the half-open interval; pre-history is null") {
    import spark.implicits._
    val ch = Seq((1L, 10L, 1L, "A"), (1L, 30L, 2L, "B")).toDF("k0", "ts", "tb", "a")
    val dim = Warehouse.scd2(ch, col("k0"), col("ts"), col("tb"), col("a"))
    val facts = Seq((1L, 5L), (1L, 10L), (1L, 29L), (1L, 30L), (1L, 99L))
      .toDF("fk", "fts")
    val got = Warehouse.pitJoin(facts, col("fk"), col("fts"), dim)
      .select(col("fts"), col("segment")).orderBy("fts").collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("segment"))))
    assert(got.toSeq == Seq(
      (5L, None), (10L, Some("A")), (29L, Some("A")),
      (30L, Some("B")), (99L, Some("B"))))
  }

  test("pitJoin: zero-width version (two changes at one ts) never matches") {
    import spark.implicits._
    // A and B both open at ts=10 (different tie-break): A's interval is
    // [10, 10) = empty; a fact at 10 must land on B only.
    val ch = Seq((1L, 10L, 1L, "A"), (1L, 10L, 2L, "B")).toDF("k0", "ts", "tb", "a")
    val dim = Warehouse.scd2(ch, col("k0"), col("ts"), col("tb"), col("a"))
    val got = Warehouse.pitJoin(Seq((1L, 10L)).toDF("fk", "fts"),
        col("fk"), col("fts"), dim)
      .select(col("segment")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("B"))
  }

  test("heavyHitters: bit-identical to the plain groupBy-filter") {
    val ev = Tables(spark, sf()).events
    val plain = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 75).orderBy("user_id").collect()
    val sketched = Warehouse.heavyHitters(ev, "user_id", 75L)
      .orderBy("user_id").collect()
    assert(plain.nonEmpty)
    assert(sketched.toSeq == plain.toSeq)
  }

  test("heavyHitters: sketch prefilter actually prunes the exact pass") {
    import spark.implicits._
    // 3 heavy keys (100x) in a sea of 500 singletons: the candidate filter
    // must keep ~the heavy rows only. eps=1e-3 over n=800 rows gives
    // estimate error <= ~1, far under the threshold gap.
    val df = ((1 to 3).flatMap(k => Seq.fill(100)(k.toLong)) ++
      (1000L to 1499L)).toDF("k")
    val cms = df.stat.countMinSketch("k", 1e-3, 0.999, 42)
    val kept = df.collect().count(r => cms.estimateCount(r.getLong(0)) >= 50L)
    assert(kept >= 300 && kept < 350, s"prefilter kept $kept rows")
    val got = Warehouse.heavyHitters(df, "k", 50L, eps = 1e-3)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 100L), (2L, 100L), (3L, 100L)))
  }

  test("snapshotDiff: classifies added/removed/changed, drops unchanged, null-safe") {
    import spark.implicits._
    val old = Seq((1L, Some("a"), 10.0), (2L, None: Option[String], 20.0),
      (3L, Some("c"), 30.0), (4L, Some("d"), 40.0))
      .toDF("id", "s", "x")
    val neu = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None: Option[String], 30.0), (5L, Some("e"), 50.0))
      .toDF("id", "s", "x")
    val got = Warehouse.snapshotDiff(old, neu, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    // 1 unchanged (dropped); 2 null->b changed; 3 c->null changed;
    // 4 removed; 5 added.
    assert(got.toSeq == Seq((2L, "changed"), (3L, "changed"),
      (4L, "removed"), (5L, "added")))
  }

  test("maintainAgg: births, deaths and key-moving updates equal a recompute") {
    import spark.implicits._
    val baseRows = Seq(("A", 10.0), ("A", 20.0), ("B", 5.0))
    val base = baseRows.toDF("key", "m").groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum(col("m").cast("decimal(28,2)")).as("sum_m"))
    // Delete B entirely (group death); move one A row to new group C
    // (delete old + insert new, repriced); insert a fresh C row.
    val changes = Seq(
      ("D", "B", 5.0), ("D", "A", 20.0), ("I", "C", 25.0), ("I", "C", 1.0)
    ).toDF("op", "key", "measure")
    val got = Warehouse.maintainAgg(base, changes)
      .select(col("key"), col("cnt"), col("sum_m").cast("double"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("A", 1L, 10.0), ("C", 2L, 26.0)))
  }

  test("maintainAgg over the orders change batch equals the recomputed aggregate") {
    val o = Tables(spark, sf()).orders.cache()
    val base = o.filter(col("o_orderkey") % 10 =!= 0)
      .groupBy(col("o_orderpriority").as("key"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(28,2)")).as("sum_m"))
    val survivors = col("o_orderkey") % 10 =!= 0 &&
      col("o_orderkey") % 89 =!= 0
    val changes = o.filter(col("o_orderkey") % 10 === 0)
      .select(lit("I").as("op"), col("o_orderpriority").as("key"),
        col("o_totalprice").as("measure"))
      .unionAll(o.filter(col("o_orderkey") % 10 =!= 0 &&
          col("o_orderkey") % 89 === 0)
        .select(lit("D").as("op"), col("o_orderpriority").as("key"),
          col("o_totalprice").as("measure")))
      .unionAll(o.filter(survivors && col("o_orderkey") % 13 === 0)
        .select(lit("D").as("op"), col("o_orderpriority").as("key"),
          col("o_totalprice").as("measure")))
      .unionAll(o.filter(survivors && col("o_orderkey") % 13 === 0)
        .select(lit("I").as("op"), lit("0-REPRICED").as("key"),
          (col("o_totalprice") + 100).as("measure")))
    val maintained = Warehouse.maintainAgg(base, changes)
      .select(col("key"), col("cnt"),
        round(col("sum_m").cast("double"), 2).as("rev"))
      .orderBy("key").collect().toSeq
    val recomputed = o.filter(survivors && col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderpriority").as("key"), col("o_totalprice").as("m"))
      .unionAll(o.filter(survivors && col("o_orderkey") % 13 === 0)
        .select(lit("0-REPRICED").as("key"),
          (col("o_totalprice") + 100).as("m")))
      .unionAll(o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderpriority").as("key"), col("o_totalprice").as("m")))
      .groupBy("key")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("m").cast("decimal(28,2)")).cast("double"), 2).as("rev"))
      .orderBy("key").collect().toSeq
    assert(maintained.nonEmpty && maintained.exists(_.getString(0) == "0-REPRICED"))
    assert(maintained == recomputed)
    o.unpersist()
  }

  test("snapshotDiff: refuses mismatched schemas") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq((1L, 2.0)).toDF("id", "y")
    intercept[IllegalArgumentException] {
      Warehouse.snapshotDiff(a, b, Seq("id"))
    }
  }

  test("dq checks: planted violations are counted exactly; clean checks pass") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some(5.0), "A"),           // clean
      (2L, None, "N"),                // null qty
      (3L, Some(99.0), "R"),          // out of range
      (4L, Some(7.0), "Z"),           // bad domain
      (5L, Some(3.0), "A"))
      .toDF("id", "qty", "flag")
    val got = Warehouse.dqRowChecks(rows, Seq(
        "qty_nonnull" -> col("qty").isNotNull,
        "qty_range" -> col("qty").between(1, 50),
        "flag_domain" -> col("flag").isin("A", "N", "R")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("qty_nonnull") == ((1L, false)))
    // a NULL predicate is not a violation under SQL semantics (row 2
    // counts only against the nonnull check, not the range check)
    assert(got("qty_range") == ((1L, false)))
    assert(got("flag_domain") == ((1L, false)))

    val dup = Seq(10L, 11L, 11L, 12L, 12L, 12L).toDF("k")
    val u = Warehouse.dqUnique(dup, "pk", Seq(col("k"))).collect().head
    assert(u.getLong(1) == 3L && !u.getBoolean(2))

    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(3L), None).toDF("fk")
    val f = Warehouse.dqForeignKey(child, "fk", col("fk"), parent, col("pk"))
      .collect().head
    // orphan fk=3 is the only violation; a null fk is not (SQL FK semantics)
    assert(f.getLong(1) == 1L && !f.getBoolean(2))

    val clean = Warehouse.dqRowChecks(rows, Seq("id_positive" -> (col("id") > 0)))
      .collect().head
    assert(clean.getLong(1) == 0L && clean.getBoolean(2))
  }

  test("dq checks on an empty table: zero violations, all pass") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "qty")
    val got = Warehouse.dqRowChecks(empty, Seq(
        "qty_range" -> col("qty").between(1, 50)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(("qty_range", 0L, true)))
  }
}
