package graft.repl

import org.apache.spark.sql.SparkSession

/** Forked-JVM victim for the kill-9 crash test: replays an incremental
  * dump but parks forever inside the merge swap's vulnerable window (live
  * dir renamed aside, staged dir not yet landed), signalling the parent via
  * a marker file. The parent SIGKILLs it there — a REAL hard crash of a
  * real replay at the worst possible instant — and then proves
  * recoverSwap + retry converge.
  */
object CrashVictim {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val dumpPath = args(1)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    CrashHooks.betweenSwapRenames = () => {
      java.nio.file.Files.createFile(java.nio.file.Paths.get(root, "_inwindow"))
      Thread.sleep(600000) // park: the parent kill -9s us here
    }
    val target = DbCatalog(spark, s"$root/tgt")
    Load(spark, target,
      ReplConfig(dumpRoot = s"$root/dumps", rerunSleepMs = 10, incrRerun = 1))
      .replay(dumpPath)
  }
}
