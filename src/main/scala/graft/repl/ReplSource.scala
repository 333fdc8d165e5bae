package graft.repl

import org.apache.spark.sql.DataFrame

/** The read-side surface a replication SOURCE must expose — everything
  * [[Dump]] and [[ReplicationJob]] consume. The reference's source is a
  * HiveServer2 JDBC endpoint (`/root/reference/env.sh:4-5`); the engine
  * supports two topologies behind this one trait:
  *
  *   - [[DbCatalog]]: a directory-backed warehouse (parquet tables + the
  *     engine's own event log) — the primary, file-native path;
  *   - [[JdbcSource]]: a live JDBC endpoint (tables + a `graft_events`
  *     change-log table), read with Spark's partitioned JDBC scans so the
  *     dump is a distributed pull, not a driver-side cursor drain — the
  *     engine's answer to the reference's beeline-over-JDBC topology.
  *
  * Everything here is either control-plane metadata (names, watermarks) or
  * a lazily-evaluated DataFrame; no row data crosses the driver.
  */
trait ReplSource {
  def dbExists(db: String): Boolean

  /** User tables (never the change log or metadata objects). */
  def listTables(db: String): Seq[String]

  /** External tables replicate by file copy, not snapshot (see [[ExtCopy]]);
    * sources without a file plane never report external tables.
    */
  def isExternal(table: String): Boolean

  /** Current transaction watermark = max logged event id, 0 if none —
    * source-side `REPL STATUS` (`/root/reference/HQL/replstatus.hql:2-4`).
    */
  def currentTxnId(db: String): Long

  def readTable(db: String, table: String): DataFrame

  /** Physical partition column of the table, if partitioned (drives the
    * dump's layout-preserving snapshot and the replica's partition-scoped
    * merges). Sources without a dir layout return None.
    */
  def partitionSpec(db: String, table: String): Option[String]

  /** Events strictly after `fromId`, with the predicate PUSHED to the
    * storage layer (parquet row-group stats / remote SQL WHERE clause).
    */
  def readEventsAfter(db: String, fromId: Long): DataFrame

  def listViews(db: String): Seq[String]
  def viewSql(db: String, name: String): Option[String]

  /** Source db location recorded in the dump manifest — dereferenced only
    * to sync external tables, so non-file sources return an opaque label.
    */
  def sourceDbPath(db: String): String
}
