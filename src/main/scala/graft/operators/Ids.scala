package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global contiguous id assignment WITHOUT the single-partition
  * global window (`row_number() OVER (ORDER BY …)` with no PARTITION
  * BY funnels 100 TB through one task — the classic scale-killer this
  * operator exists to avoid), and without `zipWithIndex`'s dependence
  * on physical partition layout.
  *
  * Two passes, both bounded:
  *  1. `buckets − 1` boundary values of `rangeCol` via
  *     `approxQuantile` (an O(buckets) driver array — boundaries only
  *     affect load BALANCE, never the assigned ids, so the quantile
  *     sketch's approximation is harmless); rows map to an ordered
  *     range-bucket by an in-row compare against the literal
  *     boundaries — every row with the same `rangeCol` value lands in
  *     the same bucket, so the per-bucket windows below see complete
  *     tie groups.
  *  2. per-bucket counts (≤ `buckets` rows) → exclusive prefix-sum
  *     offsets, broadcast back; uid = offset(bucket) +
  *     row_number within bucket − 1. The only corpus-wide window is
  *     PARTITIONED BY bucket — `buckets`-way parallel, each task
  *     sorting ~n/buckets rows.
  *
  * The result equals `row_number() OVER (ORDER BY rangeCol,
  * tieBreak…) − 1` exactly (the oracle form), for any boundary
  * choice: buckets are ordered, disjoint ranges of the `rangeCol`
  * value space, so concatenating them in bucket order IS the global
  * order. Requires (`rangeCol`, tieBreak…) unique per row (it's an id
  * key) and `rangeCol` numeric, non-null, exact in a double (int/
  * long ≤ 2⁵² — boundary compares run as doubles). A single hot
  * `rangeCol` value skews its bucket; pick a higher-cardinality range
  * key (or pre-combine, e.g. length·K + hash) when the primary key
  * is that degenerate.
  */
object Ids {

  def contiguousIds(df: DataFrame, rangeCol: String,
                    tieBreak: Seq[String], buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (buckets == 1) Array.empty[Double]
      else df.stat.approxQuantile(rangeCol, probs, 0.001).distinct.sorted
    val withB =
      if (bounds.isEmpty) df.withColumn("__b", lit(0))
      else df.withColumn("__b",
        size(filter(array(bounds.map(lit): _*), x => x <= col(rangeCol))))
    val counts = withB.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
    // exclusive prefix sum over ≤ `buckets` rows — the unpartitioned
    // window is deliberate and bounded (the Splits prefix-table shape)
    val w = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.select(col("__b"),
      coalesce(sum(col("__n")).over(w), lit(0L)).as("__off"))
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy((rangeCol +: tieBreak).map(col): _*)
    withB.join(broadcast(offs), "__b")
      .withColumn("uid",
        col("__off") + row_number().over(inBucket).cast("long") - lit(1L))
      .drop("__b", "__off")
  }
}
