package graft.repl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replication INTO a live JDBC endpoint (embedded Derby) — the reference's
  * load side (`TARGET_JDBC_URL`, `/root/reference/env.sh:4`; `REPL LOAD`
  * over the target connection, `beeline_functions.sh:220-226`). Covers the
  * full two-endpoint topology: parquet→Derby and Derby→Derby, with the
  * watermark resident AT the target endpoint and merges applied as one
  * endpoint transaction.
  */
class JdbcTargetSpec extends SparkSpec {

  private val srcUrl = "jdbc:derby:memory:jtsrc;create=true"
  private val tgtUrl = "jdbc:derby:memory:jttgt;create=true"

  private def qd(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
  private def qt(db: String, t: String) = s"${qd(db)}.${qd(t)}"

  private def exec(url: String, sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }

  private def eventsDf(rows: Seq[(Long, String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "table", "op", "key", "row_json")
  }

  private def rowSet(df: DataFrame): Set[String] = df.collect().map(_.toString).toSet

  test("parquet -> Derby: bootstrap + transactional incremental, watermark at the endpoint") {
    val db = "pj1"
    val root = java.nio.file.Files.createTempDirectory("graft-jt1").toString
    val source = DbCatalog(spark, s"$root/src")
    source.createDb(db)
    val region = Tables(spark, sf()).region.select(col("r_regionkey"), col("r_name"))
    val nation = Tables(spark, sf()).nation
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    source.writeTable(db, "region", region)
    source.writeTable(db, "nation", nation)
    source.createView(db, "big_nations",
      "SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey")

    val target = JdbcTarget(spark, tgtUrl)
    val cfg = ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10)
    val job = ReplicationJob(spark, source, target, s"$root/dumps", cfg)

    val r1 = job.run(db)
    assert(r1.kind == "bootstrap" && r1.verify == "SUCCESS")
    // tables landed at the endpoint, byte-equal
    assert(target.listTables(db) == Seq("nation", "region"))
    assert(rowSet(target.readTable(db, "region")) == rowSet(region))
    assert(rowSet(target.readTable(db, "nation")) == rowSet(nation))
    // the watermark is endpoint-resident (graft_meta schema), not a file
    assert(target.watermark(db).contains(source.currentTxnId(db)))
    // the view definition replicated and evaluates over the endpoint tables
    assert(target.listViews(db) == Seq("big_nations"))
    assert(rowSet(target.readView(db, "big_nations")) ==
      rowSet(source.readView(db, "big_nations")))

    // incremental: upsert + delete merge transactionally; watermark advances
    import DbCatalog._
    source.appendEvents(db, Seq(
      Event("region", OpUpsert, "0", """{"r_regionkey":0,"r_name":"AFRICA-J2"}"""),
      Event("region", OpDelete, "3", null),
      Event("region", OpUpsert, "77", """{"r_regionkey":77,"r_name":"NEW-77"}""")))
    val r2 = job.run(db)
    assert(r2.kind == "incremental" && r2.verify == "SUCCESS")
    // merge cost from the endpoint's own update counts: 2 upserts inserted;
    // bytes/partitions are the endpoint's plane (reported 0)
    assert(r2.tableStats.map(s => s.table -> s.rowsMerged).toMap == Map("region" -> 2L))
    assert(r2.tableStats.head.bytesRewritten == 0L &&
      r2.tableStats.head.partitionsTouched == 0L)
    // and the endpoint-resident run log stores the same JSON
    val c = java.sql.DriverManager.getConnection(tgtUrl)
    try {
      val st = c.createStatement()
      val rs = st.executeQuery(
        s"""SELECT "table_stats" FROM ${JdbcTarget.RunsTable} WHERE "kind" = 'incremental'""")
      try {
        assert(rs.next())
        val js = rs.getString(1)
        assert(js.contains(""""table":"region","rowsMerged":2"""), js)
      } finally { rs.close(); st.close() }
    } finally c.close()
    val reg = target.readTable(db, "region")
    assert(reg.where(col("r_regionkey") === 0 && col("r_name") === "AFRICA-J2").count() == 1)
    assert(reg.where(col("r_regionkey") === 3).isEmpty)
    assert(reg.where(col("r_regionkey") === 77).count() == 1)
    assert(reg.count() == region.count() - 1 + 1)
    // no staging leftovers after a clean merge
    assert(target.listTables(db) == Seq("nation", "region"))

    // nothing new -> five-way verify NOOP, watermark stable
    assert(job.run(db).verify == "NOOP")
  }

  test("parquet -> Derby: DDL replay (create, alter, rename, truncate) through events") {
    val db = "pj2"
    val root = java.nio.file.Files.createTempDirectory("graft-jt2").toString
    val source = DbCatalog(spark, s"$root/src")
    source.createDb(db)
    source.writeTable(db, "region",
      Tables(spark, sf()).region.select(col("r_regionkey"), col("r_name")))
    val target = JdbcTarget(spark, tgtUrl)
    val cfg = ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10)
    val job = ReplicationJob(spark, source, target, s"$root/dumps", cfg)
    assert(job.run(db).verify == "SUCCESS")

    import DbCatalog._
    import org.apache.spark.sql.types._
    // CREATE TABLE + rows into it
    source.writeTable(db, "tags", spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("tag_id", LongType), StructField("tag", StringType)))))
    source.appendEvents(db, Seq(
      Event("tags", OpCreateTable, null, "tag_id BIGINT, tag STRING"),
      Event("tags", OpUpsert, "1", """{"tag_id":1,"tag":"alpha"}"""),
      Event("tags", OpUpsert, "2", """{"tag_id":2,"tag":"beta"}""")))
    assert(job.run(db).verify == "SUCCESS")
    assert(target.tableExists(db, "tags"))
    assert(target.readTable(db, "tags").count() == 2)

    // ALTER (add column): endpoint ALTER TABLE ADD COLUMN; old rows null
    source.alterTable(db, "tags", StructType(Seq(
      StructField("tag_id", LongType), StructField("tag", StringType),
      StructField("weight", DoubleType))))
    source.appendEvents(db, Seq(
      Event("tags", OpUpsert, "3", """{"tag_id":3,"tag":"gamma","weight":0.5}""")))
    assert(job.run(db).verify == "SUCCESS")
    val tags = target.readTable(db, "tags")
    assert(tags.columns.toSeq == Seq("tag_id", "tag", "weight"))
    assert(tags.where(col("tag_id") === 1 && col("weight").isNull).count() == 1)
    assert(tags.where(col("tag_id") === 3 && col("weight") === 0.5).count() == 1)

    // RENAME with DML on both sides of the rename
    source.appendEvents(db, Seq(
      Event("tags", OpUpsert, "4", """{"tag_id":4,"tag":"delta","weight":1.0}""")))
    source.renameTable(db, "tags", "labels")
    source.appendEvents(db, Seq(
      Event("labels", OpUpsert, "5", """{"tag_id":5,"tag":"epsilon","weight":2.0}""")))
    assert(job.run(db).verify == "SUCCESS")
    assert(!target.tableExists(db, "tags"))
    val labels = target.readTable(db, "labels")
    assert(labels.where(col("tag_id").isin(4L, 5L)).count() == 2)
    assert(labels.count() == 5)

    // TRUNCATE: rows gone, schema kept, later DML lands
    source.truncateTable(db, "labels")
    source.appendEvents(db, Seq(
      Event("labels", OpUpsert, "9", """{"tag_id":9,"tag":"zeta","weight":9.0}""")))
    assert(job.run(db).verify == "SUCCESS")
    val after = target.readTable(db, "labels")
    assert(after.columns.toSeq == Seq("tag_id", "tag", "weight"))
    assert(after.count() == 1)
    assert(after.head().getLong(0) == 9L)
  }

  test("Derby -> Derby: both endpoints behind JDBC (the reference's topology)") {
    val db = "dd1"
    exec(srcUrl, s"CREATE SCHEMA ${qd(db)}")
    val supplier = Tables(spark, sf()).supplier
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    graft.sources.Jdbc.write(supplier, srcUrl, qt(db, "supplier"))
    graft.sources.Jdbc.write(eventsDf(Seq(
      (1L, "supplier", DbCatalog.OpUpsert, "1",
        """{"s_suppkey":1,"s_name":"SUP-DD","s_acctbal":42.5}"""))),
      srcUrl, qt(db, DbCatalog.EventsTable))

    val root = java.nio.file.Files.createTempDirectory("graft-jt3").toString
    val source = JdbcSource(spark, srcUrl, numPartitions = 2)
    val target = JdbcTarget(spark, tgtUrl)
    val cfg = ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10)
    val job = ReplicationJob(spark, source, target, s"$root/dumps", cfg)

    val r1 = job.run(db)
    assert(r1.kind == "bootstrap" && r1.verify == "SUCCESS")
    assert(rowSet(target.readTable(db, "supplier")) == rowSet(supplier))
    assert(target.watermark(db).contains(1L))

    // remote change log grows; incremental ships only the tail and merges
    // transactionally at the target endpoint
    graft.sources.Jdbc.write(eventsDf(Seq(
      (2L, "supplier", DbCatalog.OpUpsert, "1",
        """{"s_suppkey":1,"s_name":"SUP-DD-V2","s_acctbal":99.0}"""),
      (3L, "supplier", DbCatalog.OpDelete, "2", null))),
      srcUrl, qt(db, DbCatalog.EventsTable), mode = "append")
    val r2 = job.run(db)
    assert(r2.kind == "incremental" && r2.verify == "SUCCESS")
    val sup = target.readTable(db, "supplier")
    assert(sup.where(col("s_suppkey") === 1 && col("s_name") === "SUP-DD-V2").count() == 1)
    assert(sup.where(col("s_suppkey") === 2).isEmpty)
    assert(sup.count() == supplier.count() - 1)
    assert(target.watermark(db).contains(3L))
    assert(job.run(db).verify == "NOOP")
  }

  test("external tables: refused without a file plane, replicated with extRoot") {
    import java.nio.file.{Files, Paths}
    val db = "pj3"
    val root = java.nio.file.Files.createTempDirectory("graft-jt4").toString
    val source = DbCatalog(spark, s"$root/src")
    source.createDb(db)
    source.writeTable(db, "region",
      Tables(spark, sf()).region.select(col("r_regionkey"), col("r_name")))
    Files.createDirectories(Paths.get(s"$root/src/$db/ext_logs"))
    Files.writeString(Paths.get(s"$root/src/$db/ext_logs/p0.txt"), "raw")
    val cfg = ReplConfig(dumpRoot = s"$root/dumps",
      includeExternalTables = true, rerunSleepMs = 10)

    // no extRoot: the load refuses loudly (no silent skip)
    val bare = ReplicationJob(spark, source, JdbcTarget(spark, tgtUrl),
      s"$root/dumps", cfg)
    val e = intercept[Exception](bare.run(db))
    assert(e.getMessage.contains("no file plane"), e.getMessage)
    assert(JdbcTarget(spark, tgtUrl).watermark(db).isEmpty)

    // with extRoot: managed rows to the endpoint, external files to the root
    val target = JdbcTarget(spark, tgtUrl, extRoot = Some(s"$root/extrepl"))
    val job = ReplicationJob(spark, source, target, s"$root/dumps", cfg)
    assert(job.run(db).verify == "SUCCESS")
    assert(Files.readString(Paths.get(s"$root/extrepl/$db/ext_logs/p0.txt")) == "raw")
    assert(target.readTable(db, "region").count() == 5)
  }
}
