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

  test("binaryFile ingest: loose PNG files on disk flow into the fingerprint dedup") {
    import org.apache.spark.sql.functions._
    // Write loose media objects the way a bucket holds them (one file per
    // image, plus a non-matching sidecar the glob must skip), read them
    // back through the binaryFile source, and dedup — the files-on-disk
    // entry of a media pipeline, end to end.
    val dir = java.nio.file.Files.createTempDirectory("graft-binf").toString
    for (d <- Seq(3L, 6L, 9L)) {
      val png = graft.operators.Multimodal.makePng(d,
        graft.operators.Multimodal.imgW(d), graft.operators.Multimodal.imgH(d))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/img_$d.png"), png)
      // byte-different re-encode of the same picture under another name
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/copy_${d + 100}.png"), png)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/manifest.txt"), "not an image".getBytes)

    val raw = Files.readBinaryFiles(spark, dir, pathGlob = "*.png")
    assert(raw.count() == 6) // the .txt sidecar never loads
    // media_id from the file name — the bucket-layout convention
    val media = raw.select(
      regexp_extract(col("path"), "_(\\d+)\\.png$", 1).cast("long").as("media_id"),
      lit("image").as("kind"), col("content").as("payload"))
    val pairs = graft.operators.Multimodal.imagePHashPairs(spark, media, maxDist = 3)
      .collect().map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"),
        r.getAs[Long]("dist"))).toSet
    assert(pairs == Set((3L, 103L, 0L), (6L, 106L, 0L), (9L, 109L, 0L)), pairs)
  }

  test("text-lines read: one row per line, raw crawl shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft-txt").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.txt"),
      "line one\nline two\nline three".getBytes)
    val got = Files.readTextLines(spark, dir).collect().map(_.getString(0)).toSet
    assert(got == Set("line one", "line two", "line three"))
  }
}
