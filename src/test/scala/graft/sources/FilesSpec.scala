package graft.sources

import graft.{SparkSpec, Tables}
import graft.util.Skew
import org.apache.spark.sql.functions._

class FilesSpec extends SparkSpec {

  private lazy val nation = Tables(spark, sf()).nation.cache()

  test("orc / csv / json round-trip the same rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-files").toString
    val want = nation.collect().map(_.toString).toSet

    Files.writeOrc(nation, s"$dir/orc")
    assert(Files.readOrc(spark, s"$dir/orc").collect().map(_.toString).toSet == want)

    val ddl = "n_nationkey INT, n_name STRING, n_regionkey INT"
    Files.writeCsv(nation, s"$dir/csv")
    assert(Files.readCsv(spark, s"$dir/csv", ddl).collect().map(_.toString).toSet == want)

    Files.writeJson(nation, s"$dir/json")
    assert(Files.readJson(spark, s"$dir/json", ddl).collect().map(_.toString).toSet == want)

    Files.writeXml(nation, s"$dir/xml", rowTag = "nation")
    assert(Files.readXml(spark, s"$dir/xml", ddl, rowTag = "nation")
      .collect().map(_.toString).toSet == want)
  }

  test("salted two-stage aggregation equals direct groupBy exactly") {
    val li = Tables(spark, sf()).lineitem
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    val salted = Skew.saltedAggregate(li,
      keys = Seq("l_returnflag"), saltFrom = col("l_orderkey"), n = 8,
      partial = Seq(sum(col("l_quantity").cast("decimal(18,4)")).as("s"),
        count(lit(1)).as("n")),
      merge = Seq(sum(col("s")).as("s"), sum(col("n")).as("n")))
      .collect().map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, (s, n)) =>
      assert(salted(k)._1.compareTo(s) == 0 && salted(k)._2 == n, k)
    }
  }
}
