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
  * EAGER: unlike most operators here, this one runs Spark jobs at
  * call time (the `approxQuantile` sketch and the per-bucket count
  * collect below) before returning its lazy result plan — callers
  * composing purely lazy pipelines should call it last. The input
  * lineage is evaluated twice in total (once for the counts, once by
  * the returned plan); both are pruned scans, not shuffles.
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
  *  2. per-bucket counts (≤ `buckets` rows, collected — a bounded
  *     driver array) → exclusive prefix-sum offsets computed on the
  *     driver and broadcast back; uid = offset(bucket) +
  *     row_number within bucket − 1. The only corpus-wide window is
  *     PARTITIONED BY bucket — `buckets`-way parallel, each task
  *     sorting ~n/buckets rows. The collected counts also feed the
  *     fail-loud skew guard below.
  *
  * The result equals `row_number() OVER (ORDER BY rangeCol,
  * tieBreak…) − 1` exactly (the oracle form), for any boundary
  * choice: buckets are ordered, disjoint ranges of the `rangeCol`
  * value space, so concatenating them in bucket order IS the global
  * order. Requires (`rangeCol`, tieBreak…) unique per row (it's an id
  * key) and `rangeCol` numeric, non-null, exact in a double (int/
  * long ≤ 2⁵² — boundary compares run as doubles). A single hot
  * `rangeCol` value skews its bucket — and because at 100 TB that is
  * a silent single-task sort (exactly the killer this operator
  * exists to avoid), the skew is FAIL-LOUD: if any bucket holds more
  * than `skewTolerance ×` its fair share of the rows, the call
  * raises with the hot bucket named instead of quietly degrading.
  * Pick a higher-cardinality range key (or pre-combine, e.g.
  * length·K + hash) when the primary key is that degenerate;
  * `buckets = 1` opts out (single-bucket is then the explicit ask).
  */
object Ids {

  def contiguousIds(df: DataFrame, rangeCol: String,
                    tieBreak: Seq[String], buckets: Int,
                    skewTolerance: Double = 4.0): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(skewTolerance >= 1.0,
      s"skewTolerance must be >= 1, got $skewTolerance")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (buckets == 1) Array.empty[Double]
      else df.stat.approxQuantile(rangeCol, probs, 0.001).distinct.sorted
    val withB =
      if (bounds.isEmpty) df.withColumn("__b", lit(0))
      else df.withColumn("__b",
        size(filter(array(bounds.map(lit): _*), x => x <= col(rangeCol))))
    // per-bucket counts: ≤ `buckets` rows, a bounded driver array —
    // feeds both the skew guard and the exclusive prefix-sum offsets
    // (computed here instead of a second global window). NOTE this
    // collect() makes the call EAGER — a Spark count job runs at call
    // time, and the `withB` lineage (scan + bucket expr) is evaluated
    // again by the returned plan: two pruned scans total, traded for
    // never shuffling the corpus into one global-window reducer.
    val counts = withB.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    if (buckets > 1 && total > 0) {
      val (hotB, hotN) = counts.maxBy(_._2)
      val fair = total.toDouble / buckets
      if (hotN > skewTolerance * fair)
        throw new IllegalStateException(
          s"contiguousIds: range key '$rangeCol' is too skewed — " +
            s"bucket $hotB holds $hotN of $total rows " +
            f"(${hotN / total.toDouble * 100}%.1f%%, fair share " +
            f"${100.0 / buckets}%.1f%%, tolerance ${skewTolerance}%.1fx). " +
            "At scale this bucket becomes a single-task sort. Use a " +
            "higher-cardinality range key (e.g. pre-combine " +
            "length*K + hash) or raise skewTolerance deliberately.")
    }
    // exclusive prefix sum over the bucket-ordered counts
    val offs = {
      var acc = 0L
      counts.map { case (b, n) => val o = (b, acc); acc += n; o }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsDf = offs.toSeq.toDF("__b", "__off")
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy((rangeCol +: tieBreak).map(col): _*)
    withB.join(broadcast(offsDf), "__b")
      .withColumn("uid",
        col("__off") + row_number().over(inBucket).cast("long") - lit(1L))
      .drop("__b", "__off")
  }
}
