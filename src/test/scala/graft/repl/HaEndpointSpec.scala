package graft.repl

import java.sql.{DriverManager, SQLException}
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** HA endpoint discovery — the engine's analogue of the reference's
  * ZooKeeper service discovery (`/root/reference/env.sh:4-5`,
  * `serviceDiscoveryMode=zooKeeper`): beeline re-resolves a live
  * HiveServer2 from ZK on every invocation, so a failover between retries
  * is transparent. Here a `urlProvider` is re-evaluated on every
  * connection/scan; these specs prove a replication cycle that STARTS
  * against a dead endpoint converges once the provider names a live one —
  * without rebuilding the source/target objects.
  */
class HaEndpointSpec extends SparkSpec {

  private def diskUrl(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ha").toString
    s"jdbc:derby:$dir/$name;create=true"
  }

  test("JdbcSource urlProvider: failover between attempts lands on the live endpoint") {
    val db = "hasrc"
    val live = diskUrl("halive")
    // Seed a live Derby schema with one table + change log.
    val c = DriverManager.getConnection(live)
    try {
      val st = c.createStatement()
      try {
        st.execute(s"""CREATE SCHEMA "$db"""")
        st.execute(s"""CREATE TABLE "$db"."region" ("r_regionkey" BIGINT, "r_name" VARCHAR(64))""")
        st.execute(s"""INSERT INTO "$db"."region" VALUES (0, 'AFRICA'), (1, 'AMERICA')""")
      } finally st.close()
    } finally c.close()

    // Provider starts at a dead URL (no such database, create NOT set);
    // after the first failed cycle it "discovers" the live endpoint.
    @volatile var current = "jdbc:derby:/nonexistent/ha-dead"
    val source = JdbcSource(spark, url = "jdbc:unused:placeholder",
      urlProvider = Some(() => current))

    intercept[Exception] { source.listTables(db) } // dead endpoint surfaces
    current = live // failover: ZK now names the live server
    assert(source.listTables(db) == Seq("region"))
    assert(source.readTable(db, "region").count() == 2)
  }

  test("JdbcTarget urlProvider: a cycle started against a dead target converges after failover") {
    val db = "hatgt"
    val live = diskUrl("hatgtlive")
    val root = java.nio.file.Files.createTempDirectory("graft-ha-cycle").toString
    val source = DbCatalog(spark, s"$root/src")
    source.createDb(db)
    source.writeTable(db, "nation",
      Tables(spark, sf()).nation.select(col("n_nationkey"), col("n_name")))

    @volatile var current = "jdbc:derby:/nonexistent/ha-tgt-dead"
    val target = JdbcTarget(spark, url = "jdbc:unused:placeholder",
      urlProvider = Some(() => current))
    val job = ReplicationJob(spark, source, target, s"$root/dumps",
      ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 50))

    intercept[Exception] { job.run(db) } // bootstrap against the dead target
    current = live
    val report = job.run(db) // same objects, re-resolved endpoint
    assert(report.verify == "SUCCESS")
    assert(target.readTable(db, "nation").count() == 25)
  }
}
