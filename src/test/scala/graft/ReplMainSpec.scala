package graft

import graft.repl.ReplConfig
import org.scalatest.funsuite.AnyFunSuite

/** The CLI's `env.sh` surface: every reference config variable reachable
  * from the invocation surface, unknown keys refused (B12/B13 validation
  * stance, `/root/reference/misc_functions.sh:185-207`).
  */
class ReplMainSpec extends AnyFunSuite {

  private val base = ReplConfig(dumpRoot = "/d")

  test("key=value args map onto ReplConfig; credentials split out") {
    val (cfg, props) = ReplMain.parseConfig(base, Seq(
      "includeExternalTables=true", "incrRerun=7", "rerunSleepMs=250",
      "lockStaleMs=9000", "extCopyParallelism=64", "extVerify=true",
      "sourcePathPrefix=hdfs://prod-nn:8020", "sweepMaxConcurrent=2",
      "autoCompactFactor=3.5", "autoPurge=true",
      "user=repl_user", "password=repl_secret"))
    assert(cfg == base.copy(
      includeExternalTables = true, incrRerun = 7, rerunSleepMs = 250,
      lockStaleMs = 9000, extCopyParallelism = 64, extVerify = true,
      sourcePathPrefix = "hdfs://prod-nn:8020", sweepMaxConcurrent = 2,
      autoCompactFactor = 3.5, autoPurge = true))
    assert(props == Map("user" -> "repl_user", "password" -> "repl_secret"))
  }

  test("no args = defaults, no credentials") {
    assert(ReplMain.parseConfig(base, Seq.empty) == (base, Map.empty))
  }

  test("unknown keys and malformed values are refused, never silently dropped") {
    val e = intercept[IllegalArgumentException] {
      ReplMain.parseConfig(base, Seq("incRerun=3")) // typo'd key
    }
    assert(e.getMessage.contains("incRerun"))
    intercept[IllegalArgumentException] {
      ReplMain.parseConfig(base, Seq("incrRerun=three"))
    }
    intercept[IllegalArgumentException] {
      ReplMain.parseConfig(base, Seq("extVerify")) // not key=value
    }
  }
}
