package graft

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (q <- args) {
      t(s"$q run1")(SparkEntry.queries(q)(spark, dir).count())
      t(s"$q run2")(SparkEntry.queries(q)(spark, dir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
