package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: points `(key, t)` against
  * intervals `(key, [start, end])`, boundaries inclusive.
  *
  * Implementation: bucket time into fixed-width bins. Each interval
  * is exploded to every bin it covers (`len/W + 1` copies), each
  * point belongs to exactly one bin, and the join becomes an
  * EQUI-join on `(key, bin)` plus an exact range filter — Catalyst
  * plans a plain hash join (broadcast or shuffled), never a
  * `BroadcastNestedLoopJoin`/cartesian. A point meets each interval
  * in at most one bin (its own), so no post-join dedup is needed.
  *
  * Pick `bucketWidth` on the order of the typical interval length:
  * interval fan-out stays ~2x while each bin only meets points from
  * the same ~W-wide time slice. This is the standard distributed
  * interval-join recipe; it survives both sides being arbitrarily
  * large, and a time-skewed hot bin can be salted like any other hot
  * hash key.
  */
object RangeJoin {

  /** @param points      rows with a numeric time column `pointTime`
    * @param intervals   rows with numeric `start`/`end` columns
    *                    (inclusive). Apart from `key`, column names
    *                    must not collide with `points`.
    * @param bucketWidth bin width, same unit as the time columns
    * @return matched (point x interval) rows, all columns from both
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, start: String, end: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // floor(long/long division) is exact here: epoch values < 2^53
    // keep the double quotient's error orders of magnitude below one
    // time unit, and exact multiples of W divide to exact integers.
    val p = points.withColumn("__bin",
      floor(col(pointTime) / bucketWidth))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(start) / bucketWidth),
        floor(col(end) / bucketWidth))))
    p.join(iv, Seq(key, "__bin"))
      .filter(col(pointTime) >= col(start) && col(pointTime) <= col(end))
      .drop("__bin")
  }
}
