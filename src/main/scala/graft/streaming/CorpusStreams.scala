package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.Curation

/** Streaming corpus maintenance — the continuous-ingest face of
  * [[Curation.upsert]]: a change stream (upserts + tombstones, each
  * with a version) folded into a bucket-partitioned parquet snapshot.
  */
object CorpusStreams {

  /** foreachBatch MERGE: every micro-batch runs
    * [[Curation.upsertSnapshot]] — read ONLY the buckets the batch
    * touches, merge (broadcast anti join: the snapshot side never
    * shuffles), dynamic-partition-overwrite only those buckets.
    * Per-batch cost is O(batch + touched buckets), never O(snapshot);
    * batch replays after a failure rewrite the same partitions
    * idempotently. Pair with `.option("checkpointLocation", …)` and
    * `.trigger(…)` at the call site.
    */
  def upsertSink(delta: DataFrame, snapshotDir: String, keyCol: String,
      versionCol: String, deleteCol: String,
      buckets: Int): DataStreamWriter[Row] =
    delta.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      Curation.upsertSnapshot(snapshotDir, batch, keyCol, versionCol,
        deleteCol, buckets)
    }
}
