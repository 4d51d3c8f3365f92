package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle management for `localCheckpoint`ed frames.
  *
  * Iterative operators (connected components, BPE training) truncate
  * lineage with a per-round `localCheckpoint`, which pins the round's
  * blocks in executor storage. Spark never frees those blocks on its
  * own — `Dataset.unpersist` only knows about `cache()` entries, not
  * checkpoint RDDs — so a loop that checkpoints N times leaves N
  * copies of its working set pinned until the session dies. On a
  * long-running 100 TB job that is monotonic storage growth (and it
  * measurably taxed every query AFTER d06/d09/d10/bpe01 in the
  * round-8 sequential bench: d06 ran 40.9 s there vs 4.5 s dedicated).
  *
  * The fix is the rolling pattern: each round pins exactly one
  * snapshot and frees the previous one, so a convergence loop holds
  * O(1) — not O(rounds) — storage. [[release]] finds the checkpoint's
  * backing RDD through the frame's `LogicalRDD` leaf and unpersists
  * it; [[roll]] packages checkpoint-new-then-free-old.
  */
object Checkpoints {

  /** The RDDs pinned by `df`'s `localCheckpoint` leaves (empty for a
    * plan that was never checkpointed — release is then a no-op).
    */
  private def pinnedRdds(df: Dataset[_]): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }

  /** Free the executor blocks backing a checkpointed frame. The frame
    * (and anything derived from it but not yet materialized) must not
    * be used afterwards — a local checkpoint has no lineage to
    * recompute from.
    */
  def release(df: Dataset[_]): Unit =
    pinnedRdds(df).foreach(_.unpersist(blocking = false))

  /** Eagerly `localCheckpoint` `next`, then free `prev`'s blocks —
    * safe because the eager checkpoint fully materializes `next`
    * before `prev` is dropped. The loop invariant: exactly one
    * snapshot pinned at any time.
    */
  def roll(next: DataFrame, prev: Dataset[_]): DataFrame = {
    val cp = next.localCheckpoint()
    release(prev)
    cp
  }
}
