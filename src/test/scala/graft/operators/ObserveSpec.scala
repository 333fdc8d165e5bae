package graft.operators

import graft.SparkSpec

/** The ingest pipeline's observe() metrics: pipeline counters must ride
  * the same action as the result (no extra scan) and agree with it.
  */
class ObserveSpec extends SparkSpec {

  test("q78 exposes one-pass corpus metrics that agree with its own output") {
    val df = graft.SparkEntry.queries("q78_ingest_pipeline")(spark, sf("sf0.001"))
    val rows = df.collect()
    val metrics = df.queryExecution.observedMetrics
    assert(metrics.contains("g78_clean"), metrics.keys.toSeq)
    val m = metrics("g78_clean")
    val nDocs = rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum
    val nChars = rows.map(_.getLong(rows.head.fieldIndex("total_chars"))).sum
    assert(m.getLong(m.fieldIndex("rows")) == nDocs, m)
    assert(m.getLong(m.fieldIndex("chars")) == nChars, m)
  }
}
