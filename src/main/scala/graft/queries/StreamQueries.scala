package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.EventStreams

/** Streaming-surface operators checked in batch mode: every transform
  * in [[EventStreams]] runs identically under `read` and `readStream`
  * (that is the point of Structured Streaming); the DuckDB oracle
  * checks the batch semantics here, and `EventStreamsSpec` drives the
  * same code through MemoryStream incrementally.
  */
object StreamQueries {
  type Q = (SparkSession, String) => DataFrame

  /** st11's per-dispatch cost budget in bytes — a few props-payloads
    * per bin at every fixture, so bins, offsets and straddling all
    * occur in every event type. Declared BEFORE the query maps: the
    * oracle string interpolates it at object init, and a
    * forward-referenced val reads as 0 there (the `// 0` NULL-bin
    * bug this comment commemorates). */
  private val DispatchBudget = 512L

  val queries: Map[String, Q] = Map(
    // Tumbling event-time windows + watermark (no-op in batch).
    "st01_tumbling_counts" -> ((s, d) =>
      EventStreams.tumblingTypeCounts(Tables.events(s, d))
        .select(unix_millis(col("w_start")).as("w_start_ms"),
          col("event_type"), col("n"), col("sum_value"))),

    // Sliding 1h windows every 30min: overlapping-window aggregation.
    "st02_sliding_rate" -> ((s, d) =>
      EventStreams.slidingRate(Tables.events(s, d))
        .select(unix_millis(col("w_start")).as("w_start_ms"), col("n"))),

    // Gap-based sessionization (30 min), batch oracle semantics.
    "st03_sessionize" -> ((s, d) =>
      EventStreams.sessionizeBatch(Tables.events(s, d), gapMs = 1800000L)
        .select(col("user_id"),
          unix_millis(col("session_start")).as("start_ms"),
          unix_millis(col("session_end")).as("end_ms"),
          col("n_events"), col("sum_value"))),

    // Planted heavy-hitter skew stress (round-6 audit item: the
    // pseudo-scale fixtures never grow a key's group, so per-key skew
    // was asserted, not measured): every 10th event is remapped to
    // user 0, giving one user 10% of the corpus, then sessionized
    // with st03's exact semantics. The gaps-and-islands window on the
    // hot key is inherently single-partition work — what this row
    // measures is that the engine's cost stays linear in the hot
    // key's rows (one in-memory sort) instead of collapsing the whole
    // stage; SCALE.md records the measured hot/uniform ratio.
    "sk02_skew_sessionize" -> ((s, d) =>
      EventStreams.sessionizeBatch(
          Tables.events(s, d).withColumn("user_id",
            when(pmod(col("event_id"), lit(10)) === 0, lit(0L))
              .otherwise(col("user_id"))),
          gapMs = 1800000L)
        .select(col("user_id"),
          unix_millis(col("session_start")).as("start_ms"),
          unix_millis(col("session_end")).as("end_ms"),
          col("n_events"), col("sum_value"))),

    // Stream-static enrichment join (events x customer dim) +
    // windowed per-segment aggregation.
    "st04_stream_enrich" -> ((s, d) =>
      EventStreams.enrichedSegmentCounts(Tables.events(s, d),
          Tables.customer(s, d))
        .select(unix_millis(col("w_start")).as("w_start_ms"),
          col("c_mktsegment"), col("n"), col("sum_value"))),

    // Stream-stream join (batch semantics for the oracle; streaming
    // convergence in EventStreamsSpec): purchases attributed to a
    // same-user view within 30 minutes.
    "st05_stream_stream_join" -> ((s, d) =>
      EventStreams.attributedPurchases(Tables.events(s, d))),

    // Stream-stream LEFT OUTER: st05 plus every unattributed view
    // with a null purchase — the "abandoned browse" feed. In the
    // stream form the watermark + time-range bound is what lets Spark
    // emit the null-padded row once a view's join window has provably
    // closed (and evict its state); batch face here for the oracle.
    "st09_attribution_outer" -> ((s, d) =>
      EventStreams.attributedPurchases(Tables.events(s, d),
        joinType = "left_outer")),

    // Streaming dedup: earliest event per (user, type, UTC day),
    // finalized by watermark in the stream form; batch semantics here
    // for the oracle.
    "st06_stream_dedup" -> ((s, d) =>
      EventStreams.firstEventPerDayBatch(Tables.events(s, d))
        .select(col("user_id"), col("event_type"),
          unix_millis(col("day")).as("day_ms"),
          unix_millis(col("first_ts")).as("first_ts_ms"),
          col("first_event_id")))

    ,
    // Top-20 session paths: st03's session assignment, each session's
    // event types joined in (t, event_id) order, counted corpus-wide.
    // The in-session ordering is an in-row sort of that session's own
    // collected rows (gap-bounded by construction) — never a global
    // sort.
    "st07_session_paths" -> ((s, d) =>
      EventStreams.sessionPaths(Tables.events(s, d),
        gapMs = 1800000L, k = 20)),

    // Per-window Count-Min over the user stream: the hourly grids
    // (O(depth·width) state per window regardless of user
    // cardinality) probed in-row for the corpus's top-5 users, laid
    // beside each window's exact count — est ≥ exact in the data
    // itself. The streaming twin (same function under readStream)
    // converges to byte-identical grids in EventStreamsSpec; the
    // oracle rebuilds cells AND estimates from scratch in SQL.
    "st10_windowed_countmin" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("ts"), col("user_id"))
      val grids = EventStreams.windowUserCms(ev, CmsD, CmsW)
        .select(unix_millis(col("w_start")).as("w_start_ms"),
          col("cms"))
      val top5 = ev.groupBy(col("user_id").cast("string").as("uid"))
        .agg(count(lit(1)).as("nt"))
        .orderBy(col("nt").desc, col("uid").asc).limit(5)
        .select(col("uid"))
      val exact = ev
        .groupBy(window(col("ts"), "1 hour").as("w"),
          col("user_id").cast("string").as("uid"))
        .agg(count(lit(1)).as("n_exact"))
        .select(unix_millis(col("w.start")).as("w_start_ms"),
          col("uid"), col("n_exact"))
      grids.crossJoin(broadcast(top5))
        .select(col("w_start_ms"), col("uid"),
          graft.operators.Sketches.cmsEstimate(col("cms"), col("uid"),
            CmsD, CmsW).as("cms_est"))
        .join(exact, Seq("w_start_ms", "uid"), "left")
        .select(col("w_start_ms"), col("uid"), col("cms_est"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"))
    }),

    // Dispatch packing: per event_type, events on a byte-cost tape
    // in (ts, event_id) order, chunked into fixed-budget dispatch
    // bins — the ingest-tier batching face. Batch form here (one
    // per-type-partitioned window — the sessionize class); the
    // streaming twin carries ONE LONG of state per type and
    // converges to this exact answer (EventStreamsSpec, default +
    // RocksDB stores).
    "st11_dispatch_packing" -> ((s, d) =>
      EventStreams.dispatchPackBatch(
        Tables.events(s, d).withColumn("c",
          octet_length(col("props"))),
        "c", budget = DispatchBudget)),

    // Windowed distinct-user LogLog registers — st10's pattern
    // (sketch state per window, registers pinned by the hash gate)
    // for cardinality instead of frequency; `ndv_exact` is the
    // verification baseline whose per-(window, user) state is
    // exactly what the sketch replaces at scale. Streaming
    // convergence (default + RocksDB stores) in EventStreamsSpec.
    // Windowed event-type-mix KL drift vs the whole table's smoothed
    // distribution — the t26 drift monitor as a continuous windowed
    // face (VERDICT r13 #5). The reference model is a bounded
    // driver-side collect (one row per event type, the domain the
    // output is keyed by); the windowed face is pure built-in sums,
    // so the streaming twin converges exactly (EventStreamsSpec,
    // default + RocksDB stores, append-mode eviction).
    "st13_windowed_drift" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("ts"), col("event_type"))
      val byType = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("cn"))
        .orderBy(col("event_type")).collect()
      val tc = byType.map(_.getLong(1)).sum
      val halfT = 0.5 * byType.length
      val model = byType.toSeq.map(r =>
        r.getString(0) -> (r.getLong(1) + 0.5) / (tc + halfT))
      EventStreams.windowTypeKl(ev, model)
        .select(unix_millis(col("w_start")).as("w_start_ms"),
          col("n_events"), col("kl"))
    }),

    "st12_windowed_loglog" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("ts"), col("user_id"))
      val regs = EventStreams.windowUserLogLog(ev, LogLogStP)
        .select(unix_millis(col("w_start")).as("w_start_ms"),
          col("bucket"), col("register"))
      val exact = ev
        .select(col("ts"), graft.operators.Sketches
          .logLog(col("user_id").cast("string"), LogLogStP).as("ll"))
        .select(col("ts"), col("ll.bucket").as("bucket"),
          col("ll.wbits").as("wbits"))
        .groupBy(window(col("ts"), "1 hour").as("w"), col("bucket"))
        .agg(countDistinct(col("wbits")).as("ndv_exact"))
        .select(unix_millis(col("w.start")).as("w_start_ms"),
          col("bucket"), col("ndv_exact"))
      regs.join(exact, Seq("w_start_ms", "bucket"))
    })
  )

  /** st10 grid shape — narrow enough that distinct users actually
    * collide within an hour, so est > exact occurs in the gate data. */
  private val CmsD = 4
  private val CmsW = 8

  /** st12 bucket bits: m = 16 registers per window — small enough
    * that every bucket is hit within an hour at fixture scale. */
  private val LogLogStP = 4

  val oracleSql: Map[String, String] = Map(
    "st01_tumbling_counts" ->
      """SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS w_start_ms,
         event_type, count(*) AS n,
         round(sum(value), 6) AS sum_value
         FROM events GROUP BY 1, 2""",
    "st02_sliding_rate" ->
      """WITH w AS (
           SELECT unnest([
             epoch_ms(to_timestamp(floor(epoch(ts) / 1800) * 1800)),
             epoch_ms(to_timestamp(floor(epoch(ts) / 1800) * 1800)) - 1800000
           ]) AS w_start_ms
           FROM events)
         SELECT w_start_ms, count(*) AS n FROM w GROUP BY 1""",
    "st03_sessionize" ->
      """WITH o AS (
           SELECT user_id, ts, value,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
           FROM events),
         marked AS (
           SELECT user_id, ts, value,
                  CASE WHEN prev_ts IS NULL
                       OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
                       THEN 1 ELSE 0 END AS new_session
           FROM o),
         numbered AS (
           SELECT user_id, ts, value,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM marked)
         SELECT user_id,
                epoch_ms(min(ts)) AS start_ms,
                epoch_ms(max(ts)) AS end_ms,
                CAST(count(*) AS INTEGER) AS n_events,
                round(sum(value), 6) AS sum_value
         FROM numbered GROUP BY user_id, session_id""",
    "sk02_skew_sessionize" ->
      """WITH ev AS (
           SELECT CASE WHEN event_id % 10 = 0 THEN 0
                       ELSE user_id END AS user_id, ts, value
           FROM events),
         o AS (
           SELECT user_id, ts, value,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
           FROM ev),
         marked AS (
           SELECT user_id, ts, value,
                  CASE WHEN prev_ts IS NULL
                       OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
                       THEN 1 ELSE 0 END AS new_session
           FROM o),
         numbered AS (
           SELECT user_id, ts, value,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM marked)
         SELECT user_id,
                epoch_ms(min(ts)) AS start_ms,
                epoch_ms(max(ts)) AS end_ms,
                CAST(count(*) AS INTEGER) AS n_events,
                round(sum(value), 6) AS sum_value
         FROM numbered GROUP BY user_id, session_id""",
    "st04_stream_enrich" ->
      """SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT)
           AS w_start_ms,
         c_mktsegment, count(*) AS n,
         round(sum(value), 6) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2""",
    "st06_stream_dedup" ->
      """WITH r AS (
           SELECT user_id, event_type, date_trunc('day', ts) AS day,
                  ts, event_id,
                  row_number() OVER (
                    PARTITION BY user_id, event_type, date_trunc('day', ts)
                    ORDER BY ts, event_id) AS rn
           FROM events)
         SELECT user_id, event_type,
                CAST(epoch_ms(day) AS BIGINT) AS day_ms,
                CAST(epoch_ms(ts) AS BIGINT) AS first_ts_ms,
                event_id AS first_event_id
         FROM r WHERE rn = 1""",
    "st05_stream_stream_join" ->
      """SELECT a.user_id, a.event_id AS view_id,
         b.event_id AS purchase_id,
         epoch_ms(b.ts) - epoch_ms(a.ts) AS lag_ms
         FROM events a JOIN events b
           ON a.user_id = b.user_id
          AND a.event_type = 'view' AND b.event_type = 'purchase'
          AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE""",
    // st09: same relation with the purchase side LEFT-JOINed (the
    // purchase-side predicates must live in ON, not WHERE, to keep
    // unmatched views)
    "st09_attribution_outer" ->
      """SELECT a.user_id, a.event_id AS view_id,
         b.event_id AS purchase_id,
         epoch_ms(b.ts) - epoch_ms(a.ts) AS lag_ms
         FROM events a LEFT JOIN events b
           ON a.user_id = b.user_id
          AND b.event_type = 'purchase'
          AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
         WHERE a.event_type = 'view'""",
    // st03's gaps-and-islands with an (t, event_id) total order, paths
    // via ordered string_agg, deterministic top-20 boundary
    "st07_session_paths" ->
      """WITH o AS (
           SELECT user_id, event_id, event_type, epoch_ms(ts) AS t,
                  lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                    ORDER BY epoch_ms(ts), event_id) AS prev_t
           FROM events),
         marked AS (
           SELECT user_id, event_id, event_type, t,
                  CASE WHEN prev_t IS NULL OR t - prev_t > 1800000
                       THEN 1 ELSE 0 END AS new_session
           FROM o),
         numbered AS (
           SELECT user_id, event_id, event_type, t,
                  sum(new_session) OVER (PARTITION BY user_id
                    ORDER BY t, event_id
                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM marked),
         paths AS (
           SELECT user_id, session_id,
                  string_agg(event_type, '>' ORDER BY t, event_id)
                    AS path
           FROM numbered GROUP BY 1, 2)
         SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         FROM paths GROUP BY 1
         ORDER BY n_sessions DESC, path LIMIT 20""",

    // st10: grid cells AND estimates rebuilt from scratch — same
    // md5-chunk row hash as CountMinAgg.cell. The LEFT JOIN is
    // load-bearing: a probe cell no user hashed into in that window
    // is an EMPTY cell, and the estimate must read it as 0 (the
    // engine grid is zero-initialized), not skip it.
    "st10_windowed_countmin" -> {
      val rs = (0 until 4).mkString("[", ", ", "]")
      def cell(r: String, item: String) =
        s"CAST(('0x' || substring(md5(CAST($r AS VARCHAR) || '|' || " +
          s"$item), 1, 8)) AS BIGINT) % 8"
      s"""WITH ev AS (SELECT CAST(epoch_ms(date_trunc('hour', ts))
                        AS BIGINT) AS w,
                      CAST(user_id AS VARCHAR) AS uid FROM events),
          rr AS (SELECT unnest($rs) AS r),
          cells AS (SELECT ev.w, rr.r, ${cell("rr.r", "ev.uid")} AS b,
                      count(*) AS c
                    FROM ev, rr GROUP BY 1, 2, 3),
          top5 AS (SELECT uid, count(*) AS nt FROM ev
                   GROUP BY 1 ORDER BY nt DESC, uid ASC LIMIT 5),
          est AS (SELECT w.w AS w_start_ms, t.uid,
                    CAST(min(coalesce(c.c, 0)) AS BIGINT) AS cms_est
                  FROM (SELECT DISTINCT w FROM ev) w
                  CROSS JOIN top5 t CROSS JOIN rr
                  LEFT JOIN cells c ON c.w = w.w AND c.r = rr.r
                    AND c.b = ${cell("rr.r", "t.uid")}
                  GROUP BY 1, 2),
          ex AS (SELECT w AS w_start_ms, uid, count(*) AS n_exact
                 FROM ev GROUP BY 1, 2)
          SELECT est.w_start_ms, est.uid, est.cms_est,
                 CAST(coalesce(ex.n_exact, 0) AS BIGINT) AS n_exact
          FROM est LEFT JOIN ex USING (w_start_ms, uid)"""
    },

    // st11: the naive per-type running-sum window, then integer
    // div/mod into bins
    "st11_dispatch_packing" ->
      s"""WITH r AS (
            SELECT event_id, event_type,
                   CAST(octet_length(encode(props)) AS BIGINT) AS cost,
                   ts
            FROM events),
          c AS (
            SELECT event_id, event_type, cost,
                   coalesce(sum(cost) OVER (PARTITION BY event_type
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS tape
            FROM r)
          SELECT event_id, event_type, cost,
                 CAST(tape // $DispatchBudget AS BIGINT) AS bin,
                 CAST(tape % $DispatchBudget AS BIGINT) AS off
          FROM c""",

    // st12: hourly LogLog registers + exact per-bucket ndv from the
    // same 60-bit md5 slice (ltrim-of-bin is leading-zero-safe in
    // either engine's bin width)
    "st12_windowed_loglog" -> {
      val m = 1 << LogLogStP
      val rhoMax = 60 - LogLogStP + 1
      s"""WITH ev AS (
            SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT)
                     AS w,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                     1, 15)) AS BIGINT) AS hv
            FROM events),
          b AS (SELECT w, CAST(hv % $m AS INTEGER) AS bucket,
                  hv >> $LogLogStP AS wbits FROM ev),
          r AS (SELECT w, bucket, wbits,
                  CASE WHEN wbits = 0 THEN $rhoMax
                       ELSE $rhoMax - length(ltrim(bin(wbits), '0'))
                  END AS rho
                FROM b)
          SELECT w AS w_start_ms, bucket,
                 CAST(max(rho) AS INTEGER) AS register,
                 count(DISTINCT wbits) AS ndv_exact
          FROM r GROUP BY 1, 2"""
    },

    // st13: identical smoothing and operation order to the engine
    // (the t26 float discipline) — reference probabilities from the
    // whole table, per-window smoothed mix scored against them; only
    // the final KL scalar is rounded. The SQL SUM over the T grid
    // terms may add in a different order than the engine's literal
    // expression chain — both are ~1e-16 apart, absorbed by the 6 dp
    // round.
    "st13_windowed_drift" ->
      """WITH m AS (
           SELECT event_type, count(*) AS cn FROM events GROUP BY 1),
         s AS (
           SELECT CAST(sum(cn) AS BIGINT) AS tc,
                  CAST(count(*) AS BIGINT) AS t FROM m),
         w AS (
           SELECT date_trunc('hour', ts) AS ws, event_type,
                  count(*) AS c
           FROM events GROUP BY 1, 2),
         wt AS (
           SELECT ws, CAST(sum(c) AS BIGINT) AS tot FROM w GROUP BY 1),
         grid AS (
           SELECT wt.ws, wt.tot,
                  (m.cn + 0.5) / (s.tc + 0.5 * s.t) AS pc,
                  (coalesce(wc.c, 0) + 0.5) / (wt.tot + 0.5 * s.t) AS ps
           FROM wt CROSS JOIN m CROSS JOIN s
           LEFT JOIN w wc
             ON wc.ws = wt.ws AND wc.event_type = m.event_type)
         SELECT CAST(epoch_ms(ws) AS BIGINT) AS w_start_ms,
                tot AS n_events,
                round(sum(ps * ln(ps / pc)), 6) AS kl
         FROM grid GROUP BY 1, 2"""
  )
}
