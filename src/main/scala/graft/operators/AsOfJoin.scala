package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic as-of (point-in-time lookup) join — an operator native
  * engines ship as `ASOF JOIN` but Spark has no built-in for.
  *
  * Semantics: for each left ("probe") row, attach the id/time of the
  * single right ("quote") row with the greatest `rightTime <=
  * leftTime` among rows sharing the key; ties on time resolve to the
  * greatest id. Probes with no quote at-or-before get nulls (left
  * outer semantics).
  *
  * Implementation is the union-and-scan form, not a range join: tag
  * both sides, union them, and carry the most recent quote id forward
  * within each key with one `last(..., ignoreNulls)` running window.
  * Cost: ONE shuffle on the key plus a per-key sort — no candidate
  * fan-out at all, O(1) carried state per row. The naive alternatives
  * do not survive scale: a theta-join (`l.key = r.key && r.t <= l.t`
  * + max-per-probe) is O(probes x quotes) per key, and
  * `BroadcastNestedLoopJoin` caps the quote side at driver memory.
  * This form works with both sides being 100 TB fact tables; the
  * per-key sort is the same cost any time-ordered operator pays, and
  * a pathologically hot key can be salted like any other skewed
  * aggregation (quotes replicated per salt).
  */
object AsOfJoin {

  /** @param left      probe rows; every column passes through
    * @param right     quote rows
    * @param key       equi-key column present on both sides
    * @param leftTime  numeric (epoch) time column on `left`
    * @param rightTime numeric (epoch) time column on `right`
    * @param rightId   integral id column on `right` to attach
    * @return left columns + `asof_id` + `asof_time` (nulls = no match)
    */
  def asofLookup(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightId: String): DataFrame =
    asofLookupTolerant(left, right, key, leftTime, rightTime, rightId,
      tolerance = Long.MaxValue, forward = false)

  /** [[asofLookup]] with the rest of pandas/polars `merge_asof`'s
    * surface: a match-window `tolerance` and a `forward` direction.
    * backward (default): greatest `rightTime <= leftTime` with
    * `leftTime − rightTime <= tolerance`; forward: smallest
    * `rightTime >= leftTime` with `rightTime − leftTime <=
    * tolerance`. Forward is backward on NEGATED times — the scan, its
    * single shuffle, and the O(1) carried state are identical; in
    * both directions the gap test `__t − asof_time` (scan domain) is
    * the direction-correct distance, and out-of-tolerance matches
    * null out to the left-outer no-match shape. Ties at equal time
    * resolve to the greatest id backward / the LOWEST id forward (the
    * id order flips with the time negation — matching polars, which
    * keeps the first row in sort order on ties).
    *
    * Input contract: times must not be `Long.MinValue` (the forward
    * direction negates them, and −Long.MinValue overflows); any real
    * epoch time satisfies this. The tolerance gap itself is
    * overflow-guarded below — no bounded-range assumption there.
    */
  def asofLookupTolerant(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightId: String,
      tolerance: Long, forward: Boolean): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    val sign = if (forward) -1L else 1L
    val payloadType = StructType(left.schema.fields)
    // scan domain: times (and, for the tie order, ids) are multiplied
    // by `sign`; forward thereby becomes the same
    // greatest-at-or-before scan
    val probes = left.select(
      col(key).as("__k"),
      (col(leftTime).cast("long") * sign).as("__t"),
      lit(1).as("__side"),
      lit(null).cast("long").as("__rid"),
      struct(left.columns.toSeq.map(col): _*).as("__payload"))
    val quotes = right.select(
      col(key).as("__k"),
      (col(rightTime).cast("long") * sign).as("__t"),
      lit(0).as("__side"),
      (col(rightId).cast("long") * sign).as("__rid"),
      lit(null).cast(payloadType).as("__payload"))
    // Quotes sort before probes at equal time (side 0 < 1), so an
    // exactly-simultaneous quote is visible to the probe ("at or
    // before" is inclusive); equal-time quotes resolve to the max id
    // in scan order (last in id-ascending order). Probe rows carry a
    // null __rid so they never shadow a quote in the ignoreNulls scan.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // both running lasts in ONE projection → one Window node (split
    // across withColumns, the projection between them blocks
    // CollapseWindow and WindowExec walks each partition twice)
    val scanned = probes.unionByName(quotes)
      .select(col("*"),
        last(col("__rid"), ignoreNulls = true).over(w).as("__aid"),
        last(when(col("__side") === 0, col("__t")), ignoreNulls = true)
          .over(w).as("__at"))
      .filter(col("__side") === 1)
    // gap in scan domain = the direction-correct distance (backward:
    // lt−rt; forward: rt−lt); beyond tolerance → no-match nulls.
    // try_subtract guards Long overflow: a gap too large to represent
    // (probe near +2^63, quote near −2^63) yields null, and null <=
    // tolerance is null → the when() below nulls out the match — the
    // same no-match outcome the true (> Long.MaxValue) gap demands,
    // instead of a wrapped-negative gap passing the test.
    val inTol = try_subtract(col("__t"), col("__at")) <= tolerance
    scanned
      .withColumn("asof_id",
        when(inTol, col("__aid") * sign))
      .withColumn("asof_time",
        when(inTol, col("__at") * sign))
      .select(left.columns.toSeq.map(c => col(s"__payload.`$c`")) ++
        Seq(col("asof_id"), col("asof_time")): _*)
  }

  /** Nearest as-of (polars merge_asof strategy="nearest"): the quote
    * closest in |time| within `tolerance` in EITHER direction;
    * equal-distance ties resolve backward, each direction keeping
    * its own equal-time tie rule (backward: greatest id; forward:
    * lowest id — the [[asofLookupTolerant]] contracts).
    *
    * ONE shuffle total: both directions ride the same union of
    * probes and quotes, hash-partitioned by key once — the backward
    * scan is the ascending-time running `last`, the forward scan the
    * SAME running `last` under descending time (same partitioning,
    * so EnsureRequirements inserts only a second in-partition sort,
    * no second Exchange), and the argmin is in-row. The
    * compose-two-lookups alternative costs two shuffled scans PLUS a
    * probe-side join — at two 100 TB fact tables that join is a
    * third full shuffle; this form never rematerializes the probes.
    * (Scan-order tie encoding: quotes sort before probes at equal
    * time in both directions — side 0 < 1 with ASC side in both
    * orders; `__rid` ASC under ascending time makes the backward
    * last-seen the greatest id, `__rid` DESC under descending time
    * makes the forward last-seen the lowest id.)
    *
    * @return left columns + `asof_id` + `asof_time` + `asof_dist`
    *         (nulls = no quote within tolerance either way)
    */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightId: String,
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    val payloadType = StructType(left.schema.fields)
    val probes = left.select(
      col(key).as("__k"),
      col(leftTime).cast("long").as("__t"),
      lit(1).as("__side"),
      lit(null).cast("long").as("__rid"),
      struct(left.columns.toSeq.map(col): _*).as("__payload"))
    val quotes = right.select(
      col(key).as("__k"),
      col(rightTime).cast("long").as("__t"),
      lit(0).as("__side"),
      col(rightId).cast("long").as("__rid"),
      lit(null).cast(payloadType).as("__payload"))
    val wB = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("__k")
      .orderBy(col("__t").desc, col("__side").asc, col("__rid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qt = when(col("__side") === 0, col("__t"))
    // per-direction last() pairs each in ONE projection → one Window
    // node per direction (two sorted passes total, not four)
    val scanned = probes.unionByName(quotes)
      .select(col("*"),
        last(col("__rid"), ignoreNulls = true).over(wB).as("__bid"),
        last(qt, ignoreNulls = true).over(wB).as("__bat"),
        last(col("__rid"), ignoreNulls = true).over(wF).as("__fid"),
        last(qt, ignoreNulls = true).over(wF).as("__fat"))
      .filter(col("__side") === 1)
    // direction-correct non-negative gaps, overflow-guarded like the
    // directional lookups; out-of-tolerance → null (no-match)
    val bd = try_subtract(col("__t"), col("__bat"))
    val fd = try_subtract(col("__fat"), col("__t"))
    val scored = scanned
      .withColumn("__bd", when(bd <= tolerance, bd))
      .withColumn("__fd", when(fd <= tolerance, fd))
    val pickBack = col("__fd").isNull ||
      (col("__bd").isNotNull && col("__bd") <= col("__fd"))
    scored
      .withColumn("asof_id",
        when(pickBack, when(col("__bd").isNotNull, col("__bid")))
          .otherwise(col("__fid")))
      .withColumn("asof_time",
        when(pickBack, when(col("__bd").isNotNull, col("__bat")))
          .otherwise(col("__fat")))
      .withColumn("asof_dist",
        when(pickBack, col("__bd")).otherwise(col("__fd")))
      .select(left.columns.toSeq.map(c => col(s"__payload.`$c`")) ++
        Seq(col("asof_id"), col("asof_time"), col("asof_dist")): _*)
  }
}
