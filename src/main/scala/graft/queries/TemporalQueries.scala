package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AsOfJoin, RangeJoin}

/** Temporal operator pack over the `events` table: as-of join,
  * interval join, range-frame windows, lag/lead navigation — the
  * time-series surface a native analytics engine ships and Spark
  * expresses through windows + the graft operators.
  *
  * Time basis: `unix_millis(ts)` on the Spark side, `epoch_ms(ts)` in
  * DuckDB — both floor the parquet TIMESTAMP(NANOS) column, so the
  * long values agree exactly (raw timestamps never cross the engine
  * boundary; see q11's precedent).
  */
object TemporalQueries {
  type Q = (SparkSession, String) => DataFrame

  private val DayMs = 86400000L
  private val TwoHoursMs = 7200000L

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), unix_millis(col("ts")).as("t"))

  val queries: Map[String, Q] = Map(
    // As-of join: each purchase is joined to the latest at-or-before
    // view by the same user (union+window scan — one shuffle, no
    // candidate fan-out; see AsOfJoin).
    "aj01_asof_join" -> ((s, d) => {
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t"))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("t").as("vt"))
      AsOfJoin.asofLookup(purchases, views, "user_id", "t", "vt",
          "view_id")
        .select(col("event_id"),
          coalesce(col("asof_id"), lit(-1L)).as("view_id"),
          coalesce(col("t") - col("asof_time"), lit(-1L))
            .as("ms_since_view"))
    }),

    // Directional + toleranced as-of (merge_asof's full surface):
    // each purchase joined FORWARD to the user's first view within 6
    // hours AFTER it — the same one-shuffle union+scan as aj01 on
    // negated times, with out-of-tolerance matches nulled to the
    // no-match shape. Ties at equal time go to the lowest view id.
    "aj02_asof_forward_tol" -> ((s, d) => {
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t"))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("t").as("vt"))
      AsOfJoin.asofLookupTolerant(purchases, views, "user_id", "t",
          "vt", "view_id", tolerance = 21600000L, forward = true)
        .select(col("event_id"),
          coalesce(col("asof_id"), lit(-1L)).as("view_id"),
          coalesce(col("asof_time") - col("t"), lit(-1L))
            .as("ms_until_view"))
    }),

    // Nearest as-of (polars merge_asof strategy="nearest"): each
    // purchase joined to the closest view by |Δt| within a 2-hour
    // tolerance in EITHER direction; ties at equal distance resolve
    // backward (the at-or-before match wins), each direction keeping
    // its own equal-time tie rule (backward: highest id; forward:
    // lowest). ONE shuffle total (AsOfJoin.asofNearest): both
    // directions ride the same union scan — ascending and descending
    // running `last` over one hash partitioning, argmin in-row. The
    // first-shipped compose-two-lookups form cost two shuffled scans
    // plus a probe-side join; at two fact tables that join is a
    // third full shuffle (plan pin: exactly one Exchange).
    "aj03_asof_nearest" -> ((s, d) => {
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t"))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("t").as("vt"))
      AsOfJoin.asofNearest(purchases, views, "user_id", "t", "vt",
          "view_id", tolerance = TwoHoursMs)
        .select(col("event_id"),
          coalesce(col("asof_id"), lit(-1L)).as("view_id"),
          coalesce(col("asof_dist"), lit(-1L)).as("ms_dist"))
    }),

    // Interval join: per purchase, activity of the same user in the
    // 2h window starting at the purchase (bucketed equi-join — a hash
    // join on (user, bin), never a nested-loop; see RangeJoin).
    "ij01_interval_join" -> ((s, d) => {
      val e = ev(s, d)
      val anchors = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("anchor_id"), col("user_id"),
          col("t").as("w_start"), (col("t") + TwoHoursMs).as("w_end"))
      RangeJoin.intervalJoin(
          e.select(col("user_id"), col("t"), col("value")),
          anchors, "user_id", "t", "w_start", "w_end",
          bucketWidth = TwoHoursMs)
        .groupBy(col("anchor_id"))
        .agg(count(lit(1)).as("n_2h"),
          round(sum(col("value")), 2).as("sum_value_2h"))
    }),

    // RANGE-frame window: events by the same user in the NEXT 24
    // hours (frame bounds are time offsets, not row counts) — the
    // per-event form of a range join against a trailing window,
    // computed with one shuffle + per-key sort.
    "w02_next24h_activity" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
        .rangeBetween(1L, DayMs)
      ev(s, d).select(col("event_id"),
        count(lit(1)).over(w).as("n_next24h"),
        coalesce(round(sum(col("value")).over(w), 2), lit(0.0))
          .as("sum_next24h"))
    }),

    // Navigation + moving aggregate: lag/lead ids, per-row value
    // delta (exact IEEE subtraction — identical in both engines), and
    // a 5-row trailing sum/count (sum+count instead of avg: both
    // engines sum the frame in the same order, but avg's division
    // timing is engine-internal).
    "w03_lag_lead_mavg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t").asc, col("event_id").asc)
      val w5 = w.rowsBetween(-4, 0)
      ev(s, d).select(col("event_id"),
        coalesce(lag(col("event_id"), 1).over(w), lit(-1L)).as("prev_id"),
        coalesce(lead(col("event_id"), 1).over(w), lit(-1L)).as("next_id"),
        coalesce(col("value") - lag(col("value"), 1).over(w), lit(0.0))
          .as("delta_value"),
        count(lit(1)).over(w5).as("n5"),
        round(sum(col("value")).over(w5), 2).as("sum5"))
    }),

    // Rank-family windows over orders: per-priority quartile (ntile),
    // cumulative distribution and percent rank. PARTITIONED windows —
    // a global ntile would be a single-reducer sort; per-priority
    // partitions shuffle on the partition key and sort locally. The
    // order-by carries o_orderkey as a total-order tiebreak, so every
    // rank value is deterministic; cume/pct are exact integer-ratio
    // divisions, identical IEEE ops in both engines — no rounding.
    "q24_decile_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cume"),
        percent_rank().over(w).as("pct_rank"))
    }),

    // Ordered conversion funnel per user: first view, first click AT
    // OR AFTER that view, first purchase at or after that click —
    // stage reached (1/2/3) and the two inter-stage latencies (-1
    // where the stage was never reached). Sequential-pattern
    // semantics, not three independent minimums. Every aggregate and
    // join keys on user_id, so the whole funnel reuses ONE hash
    // partitioning end to end — no window over the raw event stream,
    // no per-user sort.
    "q25_conversion_funnel" -> ((s, d) => {
      val e = ev(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("t")).as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("t") >= col("t_view"))
        .groupBy(col("user_id")).agg(min(col("t")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("t") >= col("t_click"))
        .groupBy(col("user_id")).agg(min(col("t")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("t_purchase").isNotNull, lit(3))
            .when(col("t_click").isNotNull, lit(2))
            .otherwise(lit(1)).as("stage"),
          coalesce(col("t_click") - col("t_view"), lit(-1L))
            .as("view_to_click_ms"),
          coalesce(col("t_purchase") - col("t_click"), lit(-1L))
            .as("click_to_purchase_ms"))
    }),

    // Cohort retention matrix: users bucketed by first-active day
    // (UTC epoch day — Math.floorDiv semantics; t is non-negative
    // here and both engines floor identically), counted per
    // day-offset they return. Shape that scales: one shuffle keyed on
    // user_id collapses each user to their distinct-day set (bounded
    // by the calendar, not the corpus — collect_set is ≤ span-days
    // longs per user), the cohort/offset math is in-row on that set,
    // and the final agg's partial (map-side) combine means the second
    // exchange carries ≤ cohorts × offsets rows per partition. No
    // window over raw events, no join back to the event stream.
    "q26_retention_cohorts" -> ((s, d) => cohortRetention(ev(s, d)))
  )

  /** Cohort retention matrix over `(user_id, t)` event rows: users
    * bucketed by first-active UTC epoch day, counted per day-offset
    * they return on. One row per (user, day) survives the first agg,
    * so the final count is count-distinct-users without a DISTINCT.
    */
  def cohortRetention(events: DataFrame): DataFrame =
    events.select(col("user_id"),
        floor(col("t") / DayMs).cast("long").as("day"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("day")).as("ds"))
      .select(array_min(col("ds")).as("cohort_day"),
        explode(col("ds")).as("day"))
      .select(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("users"))

  private val evSql =
    "SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS t FROM events"

  val oracleSql: Map[String, String] = Map(
    "aj01_asof_join" ->
      s"""WITH e AS ($evSql),
          p AS (SELECT event_id, user_id, t FROM e
                WHERE event_type = 'purchase'),
          v AS (SELECT event_id AS view_id, user_id, t AS vt FROM e
                WHERE event_type = 'view'),
          j AS (SELECT p.event_id, v.view_id, p.t - v.vt AS since,
                  row_number() OVER (PARTITION BY p.event_id
                    ORDER BY v.vt DESC, v.view_id DESC) AS rn
                FROM p JOIN v ON p.user_id = v.user_id AND v.vt <= p.t)
          SELECT p.event_id,
                 CAST(coalesce(j.view_id, -1) AS BIGINT) AS view_id,
                 CAST(coalesce(j.since, -1) AS BIGINT) AS ms_since_view
          FROM p LEFT JOIN j ON p.event_id = j.event_id AND j.rn = 1""",
    // aj02: first view at-or-after each purchase within the 6-hour
    // tolerance; ties at equal time → lowest view id (rn orders vt
    // ASC, view_id ASC)
    "aj02_asof_forward_tol" ->
      s"""WITH e AS ($evSql),
          p AS (SELECT event_id, user_id, t FROM e
                WHERE event_type = 'purchase'),
          v AS (SELECT event_id AS view_id, user_id, t AS vt FROM e
                WHERE event_type = 'view'),
          j AS (SELECT p.event_id, v.view_id, v.vt - p.t AS until_ms,
                  row_number() OVER (PARTITION BY p.event_id
                    ORDER BY v.vt ASC, v.view_id ASC) AS rn
                FROM p JOIN v ON p.user_id = v.user_id
                  AND v.vt >= p.t AND v.vt - p.t <= 21600000)
          SELECT p.event_id,
                 CAST(coalesce(j.view_id, -1) AS BIGINT) AS view_id,
                 CAST(coalesce(j.until_ms, -1) AS BIGINT)
                   AS ms_until_view
          FROM p LEFT JOIN j ON p.event_id = j.event_id AND j.rn = 1""",
    // aj03: flat candidate rule equivalent to compose-then-argmin —
    // dist ASC, then backward before forward (equal-dist tie), then
    // each direction's own id rule (backward: highest id; forward:
    // lowest), encoded as one three-key ORDER BY
    "aj03_asof_nearest" ->
      s"""WITH e AS ($evSql),
          p AS (SELECT event_id, user_id, t FROM e
                WHERE event_type = 'purchase'),
          v AS (SELECT event_id AS view_id, user_id, t AS vt FROM e
                WHERE event_type = 'view'),
          j AS (SELECT p.event_id, v.view_id, abs(v.vt - p.t) AS dist,
                  row_number() OVER (PARTITION BY p.event_id
                    ORDER BY abs(v.vt - p.t) ASC,
                      CASE WHEN v.vt <= p.t THEN 0 ELSE 1 END ASC,
                      CASE WHEN v.vt <= p.t THEN -v.view_id
                           ELSE v.view_id END ASC) AS rn
                FROM p JOIN v ON p.user_id = v.user_id
                  AND abs(v.vt - p.t) <= $TwoHoursMs)
          SELECT p.event_id,
                 CAST(coalesce(j.view_id, -1) AS BIGINT) AS view_id,
                 CAST(coalesce(j.dist, -1) AS BIGINT) AS ms_dist
          FROM p LEFT JOIN j ON p.event_id = j.event_id AND j.rn = 1""",
    "ij01_interval_join" ->
      s"""WITH e AS ($evSql),
          a AS (SELECT event_id AS anchor_id, user_id, t AS ws,
                  t + 7200000 AS we FROM e WHERE event_type = 'purchase')
          SELECT a.anchor_id, count(*) AS n_2h,
                 round(sum(e.value), 2) AS sum_value_2h
          FROM a JOIN e ON a.user_id = e.user_id
            AND e.t BETWEEN a.ws AND a.we
          GROUP BY a.anchor_id""",
    "w02_next24h_activity" ->
      s"""SELECT event_id, count(*) OVER win AS n_next24h,
            coalesce(round(sum(value) OVER win, 2), 0.0) AS sum_next24h
          FROM ($evSql)
          WINDOW win AS (PARTITION BY user_id ORDER BY t
            RANGE BETWEEN 1 FOLLOWING AND 86400000 FOLLOWING)""",
    "w03_lag_lead_mavg" ->
      s"""SELECT event_id,
            CAST(coalesce(lag(event_id, 1) OVER w, -1) AS BIGINT)
              AS prev_id,
            CAST(coalesce(lead(event_id, 1) OVER w, -1) AS BIGINT)
              AS next_id,
            coalesce(value - lag(value, 1) OVER w, 0.0) AS delta_value,
            count(*) OVER w5 AS n5,
            round(sum(value) OVER w5, 2) AS sum5
          FROM ($evSql)
          WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id),
            w5 AS (PARTITION BY user_id ORDER BY t, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""",
    "q24_decile_rank" ->
      """SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           cume_dist() OVER w AS cume,
           percent_rank() OVER w AS pct_rank
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey)""",
    "q25_conversion_funnel" ->
      s"""WITH e AS ($evSql),
          v AS (SELECT user_id, min(t) AS t_view FROM e
                WHERE event_type = 'view' GROUP BY 1),
          c AS (SELECT user_id, min(t) AS t_click
                FROM e JOIN v USING (user_id)
                WHERE event_type = 'click' AND t >= t_view GROUP BY 1),
          p AS (SELECT user_id, min(t) AS t_purchase
                FROM e JOIN c USING (user_id)
                WHERE event_type = 'purchase' AND t >= t_click
                GROUP BY 1)
          SELECT v.user_id,
            CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
                      WHEN t_click IS NOT NULL THEN 2
                      ELSE 1 END AS INTEGER) AS stage,
            CAST(coalesce(t_click - t_view, -1) AS BIGINT)
              AS view_to_click_ms,
            CAST(coalesce(t_purchase - t_click, -1) AS BIGINT)
              AS click_to_purchase_ms
          FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""",
    "q26_retention_cohorts" ->
      s"""WITH days AS (
            SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
            FROM events),
          coh AS (
            SELECT user_id, min(day) AS cohort_day
            FROM days GROUP BY 1)
          SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
                 count(*) AS users
          FROM days d JOIN coh c USING (user_id)
          GROUP BY 1, 2"""
  )
}
