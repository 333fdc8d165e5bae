package graft

import graft.repl._
import org.apache.spark.sql.SparkSession

/** Operational CLI — the engine's form of the reference's invocation
  * surface (`/root/reference/README.md:58-62`: cron runs
  * `hive3repl.sh <dbname>` per database; `env.sh` carries the endpoints).
  * One command replicates one or many databases through one Spark session:
  *
  *   ReplMain <source> <targetRoot> <dumpRoot> <db[,db...]> [allowlist]
  *
  * `<source>` and `<target>` each select their topology by form, so one
  * command serves every endpoint combination (including the reference's
  * actual two-endpoint shape, both ends JDBC):
  *   - a directory path → [[DbCatalog]] (file-native warehouse);
  *   - a `jdbc:` URL   → [[JdbcSource]] / [[JdbcTarget]] (live endpoints,
  *     the reference's wire topology, `env.sh:4-5`).
  *
  * Multiple dbs run as one concurrent [[Sweep]] (per-db locks, lock-busy ⇒
  * skip, failure isolation). Emits one JSON line per db — the structured
  * replacement for the reference's parsed log tail — and exits nonzero if
  * any db failed, so a cron/orchestrator can alert exactly like the
  * reference's `exit 1` paths.
  */
object ReplMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: ReplMain <sourceRoot|jdbcUrl> <targetRoot|jdbcUrl> <dumpRoot> <db[,db...]> [allowlist,...]")
      sys.exit(2)
    }
    val Array(src, targetRoot, dumpRoot, dbArg) = args.take(4)
    val allow: Set[String] =
      if (args.length > 4) args(4).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-repl")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val source: ReplSource =
      if (src.startsWith("jdbc:")) JdbcSource(spark, src)
      else DbCatalog(spark, src)
    val target: ReplTarget =
      if (targetRoot.startsWith("jdbc:")) JdbcTarget(spark, targetRoot)
      else DbCatalog(spark, targetRoot)
    val cfg = ReplConfig(dumpRoot = dumpRoot, dbAllowlist = allow)
    val sweep = Sweep(spark, source, target, dumpRoot, cfg)
    val outcomes = sweep.run(dbArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // JSON string escaping for error text: exception messages carry
    // quotes, backslashes and (Spark plans) newlines — the one-line-per-db
    // contract must survive exactly the failure case alerting depends on.
    def jstr(v: String): String = "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    outcomes.foreach { o =>
      val body = o.report match {
        case Some(r) =>
          s""""kind":"${r.kind}","verify":"${r.verify}","fromId":${r.fromId},""" +
          s""""toId":${r.toId},"attempts":${r.attempts},"durationMs":${r.durationMs},""" +
          s""""tables":${r.tablesJson}"""
        case None =>
          s""""skipped":${o.skipped},"error":${o.error.map(jstr).getOrElse("null")}"""
      }
      println(s"""{"db":"${o.db}",$body}""")
    }
    spark.stop()
    // skips are benign (held lock or allowlist — the reference's
    // exit-0-equivalent); real errors and failed verifies are not
    val bad = outcomes.exists(o =>
      o.error.isDefined ||
      o.report.exists(r => r.verify != "SUCCESS" && r.verify != "NOOP"))
    if (bad) sys.exit(1)
  }
}
