package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming exact-dedup: emit only the FIRST occurrence of each
  * key across all micro-batches — `mapGroupsWithState` keeping one boolean
  * per key (SURVEY.md §2.3 "streaming: stateful ops" row; the streaming
  * form of [[graft.operators.Dedup.exact]] for a continuously-ingested
  * corpus).
  *
  * State is per-key in the checkpointed state store — bounded by distinct
  * keys, partitioned by Spark, never on the driver. For 100 TB-scale
  * ingest the key should be the content hash (md5/h48), so state is
  * 16-24 bytes per distinct document.
  */
object StatefulDedup {

  final case class Keyed(key: String, id: Long)
  final case class FirstSeen(key: String, id: Long, isFirst: Boolean)

  /** For each key group in the batch, emit the smallest id if the key was
    * never seen before; afterwards remember it forever.
    */
  def firstOccurrences(spark: SparkSession, in: Dataset[Keyed]): Dataset[FirstSeen] = {
    import spark.implicits._
    in.groupByKey(_.key)
      .mapGroupsWithState[Boolean, FirstSeen](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          val minId = rows.map(_.id).min
          if (state.exists) FirstSeen(key, minId, isFirst = false)
          else { state.update(true); FirstSeen(key, minId, isFirst = true) }
      }
  }

  /** Streaming entry: dedup a stream of (key, id) and keep only firsts. */
  def run(spark: SparkSession, in: Dataset[Keyed], checkpoint: String,
          queryName: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    firstOccurrences(spark, in)
      .filter(_.isFirst)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
