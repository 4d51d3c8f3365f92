package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState,
  GroupStateTimeout, OutputMode}
import graft.operators.{Curation, Dedup}
import graft.text.TextOps
import java.sql.Timestamp

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

  /** foreachBatch incremental-rollup maintenance — the streaming face
    * of c09: each micro-batch writes its own mergeable rollup
    * FRAGMENT ([[Curation.sketchRollup]]: count + sum + HLL sketch
    * state) into a batch_id-partitioned directory; serving reads
    * [[Curation.mergeRollups]] over all fragments. Per-batch cost is
    * O(batch) — history is never rescanned — and a batch REPLAY after
    * failure dynamic-overwrites its own batch_id partition, so
    * at-least-once delivery cannot double-count (asserted in
    * EventStreamsSpec). Fragment count grows with batches; compact by
    * periodically merging fragments into one (mergeRollups output is
    * itself NOT re-mergeable once the sketch collapses to an
    * estimate, so compaction unions the sketch column and keeps it
    * binary — the same additive/union merge, estimate deferred to
    * serving).
    */
  def rollupSink(delta: DataFrame, rollupDir: String, keyCol: String,
      sumCol: String, fpCol: String): DataStreamWriter[Row] =
    delta.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      Curation.sketchRollup(batch, keyCol, sumCol, col(fpCol))
        .withColumn("batch_id", lit(id))
        .write.partitionBy("batch_id").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(rollupDir)
    }

  final case class DocInput(doc_id: Long, ts: Timestamp, text: String)
  final case class BucketDoc(doc_id: Long, t: Long)
  final case class BucketState(docs: List[BucketDoc])
  final case class CandPair(a: Long, b: Long, lag_ms: Long)

  /** Streaming near-duplicate candidate detection — MinHash-LSH dedup
    * AT INGEST TIME: each arriving document's band signatures are
    * computed IN-ROW in the scan projection
    * ([[Dedup.bandSignaturesInRow]] — Structured Streaming forbids an
    * aggregation upstream of a stateful operator, which is exactly
    * why the in-row form exists), the doc lands in its (band, sig)
    * buckets, and per-bucket `flatMapGroupsWithState` state holds the
    * recent docs of that bucket so a newcomer immediately emits a
    * candidate pair against every state doc within `horizonMs` of
    * event time.
    *
    * State is bounded two ways, the 100 TB contract: per bucket it
    * holds only docs newer than watermark − horizon (older docs can
    * never pair with in-watermark arrivals — evicted on every
    * invocation), and empty buckets remove themselves via event-time
    * timeout. A pair that shares several bands emits once per shared
    * band — fold with a downstream distinct /
    * `dropDuplicatesWithinWatermark` keyed (a, b); the convergence
    * spec compares pair SETS against the batch LSH pipeline on the
    * same rows.
    */
  def streamingNearDupCands(docs: Dataset[DocInput], horizonMs: Long,
      numHashes: Int = 16, rowsPerBand: Int = 4,
      watermark: String = "2 hours"): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    val sigs = docs.toDF()
      .select(col("doc_id"), col("ts"),
        array_distinct(graft.text.Analysis.ngrams(
          TextOps.tokenize(col("text")), 3)).as("__sh"))
      .select(col("doc_id"), col("ts"),
        explode(Dedup.bandSignaturesInRow(col("__sh"), numHashes,
          rowsPerBand)).as("bs"))
      .select(col("doc_id"), col("ts"),
        concat_ws(":", col("bs.b"), col("bs.sig")).as("bucket"))
      .withWatermark("ts", watermark)
      .as[(Long, Timestamp, String)]
    sigs
      .groupByKey(_._3)
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[(Long, Timestamp, String)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            var held = state.getOption.map(_.docs).getOrElse(Nil)
            var out = List.empty[CandPair]
            rows.toSeq.map(r => BucketDoc(r._1, r._2.getTime))
              .sortBy(d => (d.t, d.doc_id)).foreach { d =>
                held.foreach { h =>
                  if (h.doc_id != d.doc_id &&
                      math.abs(d.t - h.t) <= horizonMs)
                    out ::= CandPair(math.min(d.doc_id, h.doc_id),
                      math.max(d.doc_id, h.doc_id),
                      math.abs(d.t - h.t))
                }
                held ::= d
              }
            // docs older than wm − horizon can never pair again:
            // every future in-watermark arrival is > wm
            held = held.filter(_.t + horizonMs >= wm)
            if (held.isEmpty) state.remove()
            else {
              state.update(BucketState(held))
              state.setTimeoutTimestamp(
                held.map(_.t).max + horizonMs + 1)
            }
            out.reverseIterator
          }
      }
  }
}
