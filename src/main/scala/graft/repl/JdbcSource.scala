package graft.repl

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** A live JDBC endpoint as a replication SOURCE — the engine's re-expression
  * of the reference's actual topology: every dump the reference takes goes
  * through a HiveServer2 JDBC connection (`/root/reference/env.sh:4-5`,
  * `beeline_functions.sh:18,103,157,220` — beeline is just a JDBC client).
  * Where the reference forks a beeline JVM and awk-parses its stdout, the
  * engine reads the same endpoint as typed DataFrames:
  *
  *   - table snapshots are PARTITIONED parallel scans ([[graft.sources.Jdbc
  *     .readPartitioned]]) split on the table's integral key, so a bootstrap
  *     pulls with N concurrent range-disjoint cursors instead of one
  *     connection draining the table through the driver — at 100 TB this is
  *     the difference between a dump and a outage;
  *   - the incremental delta is a filter on the source's `graft_events`
  *     change-log table whose `event_id > watermark` predicate Catalyst
  *     pushes into the remote WHERE clause (`PushedFilters` on the scan —
  *     gated in JdbcReplicationSpec), so the endpoint ships only the tail;
  *   - metadata (table/view names, watermarks, partition bounds) flows over
  *     one control-plane connection; row data never touches the driver.
  *
  * A "db" is a schema at the endpoint. Objects are expected to be created
  * with case-preserved (quoted) identifiers — true for everything the
  * engine itself writes via Spark's JDBC sink, which quotes all identifiers.
  * Views replicate by definition text when the endpoint exposes it
  * (Derby: `SYS.SYSVIEWS`); endpoints that don't simply replicate tables.
  */
final case class JdbcSource(spark: SparkSession, url: String,
                            numPartitions: Int = 8,
                            connProps: Map[String, String] = Map.empty,
                            urlProvider: Option[() => String] = None)
    extends ReplSource {

  /** Endpoint URL, re-resolved on EVERY connection and scan — the engine's
    * analogue of the reference's ZooKeeper service discovery
    * (`/root/reference/env.sh:4-5`, `serviceDiscoveryMode=zooKeeper`): the
    * reference's beeline asks ZK for a live HiveServer2 on each invocation,
    * so an endpoint failover between retries is transparent. With a
    * `urlProvider`, the engine gets the same property: each retry attempt
    * ([[Retry.retry]]) rebuilds its reads, which re-resolves the URL and
    * lands on whatever endpoint the provider now names. The static `url`
    * remains the no-discovery default.
    */
  private def endpoint: String = urlProvider.map(_()).getOrElse(url)

  // Embedded '"' doubles per the SQL standard — qt() output is interpolated
  // into executed SQL, so an unescaped quote in a db/table name would
  // produce malformed (or injected) statements.
  private def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
  private def qt(db: String, table: String): String = s"${q(db)}.${q(table)}"

  /** Credential/connection properties (`user`/`password`/driver knobs) —
    * the engine's form of the reference's authenticated beeline endpoint
    * (`BEELINE_USER`, `/root/reference/env.sh:21`). Applied to BOTH the
    * control-plane connections and Spark's distributed JDBC scans.
    */
  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    connProps.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  private def withConn[A](body: Connection => A): A = {
    val c = DriverManager.getConnection(endpoint, props)
    try body(c) finally c.close()
  }

  override def dbExists(db: String): Boolean = withConn { c =>
    val rs = c.getMetaData.getSchemas(null, db)
    try rs.next() finally rs.close()
  }

  private def listObjects(db: String, kind: String): Seq[String] = withConn { c =>
    val rs = c.getMetaData.getTables(null, db, "%", Array(kind))
    val names = scala.collection.mutable.ListBuffer[String]()
    try { while (rs.next()) names += rs.getString("TABLE_NAME") } finally rs.close()
    // hide the change log and any [[JdbcTarget]] staging leftovers — a
    // replica endpoint can serve as the next hop's source (chained topology)
    names.toSeq
      .filterNot(n => n == DbCatalog.EventsTable ||
        n.startsWith(JdbcTarget.StagingPrefix))
      .sorted
  }

  override def listTables(db: String): Seq[String] = listObjects(db, "TABLE")

  override def isExternal(table: String): Boolean = false // no file plane

  override def currentTxnId(db: String): Long = withConn { c =>
    val st = c.createStatement()
    try {
      val rs = st.executeQuery(
        s"""SELECT MAX("event_id") FROM ${qt(db, DbCatalog.EventsTable)}""")
      try { if (rs.next() && rs.getObject(1) != null) rs.getLong(1) else 0L }
      finally rs.close()
    } catch { case _: java.sql.SQLException => 0L } // no event log yet
    finally st.close()
  }

  /** Partitioned parallel snapshot: when the table's FIRST column (the
    * engine's key convention) is integral, read its min/max over the
    * control-plane connection and split the scan into `numPartitions`
    * range-disjoint remote queries; otherwise fall back to one cursor
    * (small dimension tables).
    */
  override def readTable(db: String, table: String): DataFrame = {
    val probe = graft.sources.Jdbc.read(spark, endpoint, qt(db, table), props)
    val key = probe.schema.fields.head
    val integral = key.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (!integral || numPartitions <= 1) return probe
    val bounds = withConn { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(
          s"SELECT MIN(${q(key.name)}), MAX(${q(key.name)}) FROM ${qt(db, table)}")
        try {
          if (rs.next() && rs.getObject(1) != null) Some((rs.getLong(1), rs.getLong(2)))
          else None // empty table
        } finally rs.close()
      } finally st.close()
    }
    bounds match {
      case Some((lo, hi)) if hi > lo =>
        graft.sources.Jdbc.readPartitioned(spark, endpoint, qt(db, table),
          key.name, lo, hi, numPartitions, props)
      case _ => probe
    }
  }

  override def partitionSpec(db: String, table: String): Option[String] = None

  /** Delta scan with the watermark predicate pushed into the remote WHERE
    * clause (Catalyst emits `"event_id" > ?` into the generated SQL —
    * `PushedFilters: [IsNotNull(event_id), GreaterThan(event_id,…)]`).
    */
  override def readEventsAfter(db: String, fromId: Long): DataFrame =
    graft.sources.Jdbc.read(spark, endpoint, qt(db, DbCatalog.EventsTable), props)
      .filter(col("event_id") > fromId)

  override def listViews(db: String): Seq[String] = listObjects(db, "VIEW")

  /** View definition text from Derby's catalog. `SYS.SYSVIEWS` stores the
    * full `CREATE VIEW … AS <query>` statement; the dump stores only the
    * query, so the prefix is stripped (case-insensitively, first ` AS `
    * after the view name). The text is then normalized from the endpoint's
    * SQL dialect to the engine's: the `"db".` schema qualifier drops (the
    * replica resolves bare table names) and double-quoted identifiers
    * become backticks — identifier QUOTING only; expression syntax passes
    * through untranslated, like the reference's view replication, which
    * assumes HQL-compatible definitions end to end.
    */
  override def viewSql(db: String, name: String): Option[String] = withConn { c =>
    try {
      val ps = c.prepareStatement(
        """SELECT v.VIEWDEFINITION FROM SYS.SYSVIEWS v
          |JOIN SYS.SYSTABLES t ON v.TABLEID = t.TABLEID
          |JOIN SYS.SYSSCHEMAS s ON t.SCHEMAID = s.SCHEMAID
          |WHERE s.SCHEMANAME = ? AND t.TABLENAME = ?""".stripMargin)
      try {
        ps.setString(1, db); ps.setString(2, name)
        val rs = ps.executeQuery()
        try {
          if (!rs.next()) None
          else {
            val full = rs.getString(1)
            val query = "(?is)^\\s*create\\s+view\\b.*?\\bas\\s+(.*)$".r
              .findFirstMatchIn(full).map(_.group(1)).getOrElse(full)
            Some(translateIdentifiers(query, db))
          }
        } finally rs.close()
      } finally ps.close()
    } catch {
      // non-Derby endpoint (no SYS.SYSVIEWS): definitions are unreadable —
      // degrade to tables-only replication, as documented above
      case _: java.sql.SQLException => None
    }
  }

  /** Identifier-quoting translation with LITERAL awareness: outside
    * single-quoted strings, the `"db".` schema qualifier drops and
    * double-quoted identifiers become backticks; inside string literals
    * (including escaped `''`), nothing is touched — a quoted `"hi"` in a
    * literal must survive verbatim.
    */
  private[repl] def translateIdentifiers(sql: String, db: String): String = {
    val out = new StringBuilder(sql.length)
    var i = 0
    var inLiteral = false
    // Build the qualifier from the same escaped form the endpoint stores —
    // a db name with an embedded '"' must match its doubled catalog text.
    val qualifier = q(db) + "."
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (inLiteral) {
        out.append(ch)
        if (ch == '\'') inLiteral = false // '' (escaped quote) re-enters below
        i += 1
      } else if (ch == '\'') {
        out.append(ch); inLiteral = true; i += 1
      } else if (sql.startsWith(qualifier, i)) {
        i += qualifier.length // drop the schema qualifier
      } else if (ch == '"') {
        val end = sql.indexOf('"', i + 1)
        if (end < 0) { out.append(ch); i += 1 }
        else { out.append('`').append(sql.substring(i + 1, end)).append('`'); i = end + 1 }
      } else { out.append(ch); i += 1 }
    }
    out.toString
  }

  override def sourceDbPath(db: String): String = s"$url#$db" // opaque label
}
