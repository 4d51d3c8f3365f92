package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Splits
import graft.text.TextOps

/** Deterministic dataset-splitting pack over `documents` — the
  * reproducible (hash-based, shuffle-free) alternative to seeded
  * `randomSplit` for corpus-scale train/val/test assignment and
  * stratified sampling. Pure per-row expressions: both queries stay
  * inside the scan's codegen stage and mirror 1:1 into DuckDB.
  */
object SplitQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Salt = "graft-split"

  val queries: Map[String, Q] = Map(
    // 80/10/10 content-hash split assignment per document.
    "sp01_hash_split" -> ((s, d) => {
      val b = Splits.hashBucket(col("doc_id"), Salt, 100)
      Tables.documents(s, d).select(col("doc_id"), b.as("bucket"),
        Splits.splitName(b, trainPct = 80, valPct = 10).as("split"))
    }),

    // ~30% per-language stratified sample, reproducible by content.
    "sp02_stratified_sample" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(Splits.stratifiedKeep(col("doc_id"), col("lang"), Salt,
          ratePct = 30))
        .select(col("doc_id"), col("lang"))),

    // Source-mixture sampling: per-source keep rates (mixing weights),
    // deterministic by content hash, zero shuffle.
    "sp03_source_mix" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(Splits.mixtureKeep(col("doc_id"), col("source"), Salt,
          MixRates, defaultPct = 30))
        .select(col("doc_id"), col("source"))),

    // Exact-COUNT stratified sample (round 10, filling the sp10 id):
    // exactly min(72, |lang|) docs per language by deterministic
    // 52-bit hash priority — eval-set construction where sp02's
    // rate gate only promises an expectation. lang is the skewed
    // stratum (en ~3× the rest), so truncation AND keep-all both
    // occur at the gate fixtures. Bounded heap per stratum
    // aggregates map-side; the exchange carries |strata|×72 rows,
    // never a corpus-wide window sort.
    "sp10_stratified_exact" -> ((s, d) =>
      Splits.stratifiedExact(Tables.documents(s, d), "doc_id",
        "lang", Salt, n = StratifiedN)),

    // Temperature-flattened mix: keep rates COMPUTED from corpus
    // composition (∝ 1/√n_source, α = 1/2 sampling), not hand-tuned —
    // sp03's data-driven sibling. One count pass, broadcast rate
    // table, salted-hash keep; corpus never shuffles.
    "sp09_temperature_mix" -> ((s, d) =>
      Splits.temperatureMix(
          Tables.documents(s, d).select(col("doc_id"), col("source")),
          "doc_id", "source", Salt, scale = 4.0)
        .select(col("doc_id"), col("source"))),

    // Contrastive negative sampling over the embeddings table: per
    // anchor (vec_id < 50), the 5 different-label candidates ranked
    // lowest by a 52-bit md5 pair hash — deterministic pseudo-random
    // negatives for contrastive training. Anchors broadcast, corpus
    // streams once into per-anchor bounded heaps; no corpus shuffle,
    // no per-anchor window.
    "sp11_contrastive_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Splits.contrastiveNegatives(emb,
        emb.filter(col("vec_id") < 50), k = 5)
    }),

    // Per-source token-budget cap: greedy hash-priority prefix until
    // each source has spent its token budget. buckets=8 (not the
    // 1024 default) so the bucketed fast path AND the boundary-bucket
    // exact path are both exercised at sf0.01's ~25 docs/source.
    "sp04_token_budget" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        size(TextOps.tokenize(col("text"))).cast("long").as("n_tokens"))
      Splits.tokenBudgetCap(docs, "doc_id", "source", "n_tokens", Salt,
          budget = TokenBudget, buckets = 8)
        .select(col("doc_id"), col("source"), col("n_tokens"))
    }),

    // Deterministic global training-order shuffle — every doc's
    // position in seeded hash order, via bucketed prefix offsets
    // (never a single-reducer global sort). buckets=8 so buckets
    // hold many docs at sf0.01.
    "sp05_shuffle_rank" -> ((s, d) =>
      Splits.shuffleRank(Tables.documents(s, d)
          .select(col("doc_id")), "doc_id", Salt, buckets = 8))

    ,
    // Deterministic K-docs-per-source head sample ("take K docs per
    // domain"): the budget cap with unit costs IS per-group top-K in
    // hash-priority order, so the bucketed design carries over
    // unchanged — whole buckets decided by the broadcast prefix
    // table, only the boundary bucket sorts, full-keep rows never
    // shuffle. K=15 < the 25 docs/source at sf0.01, so keeps and
    // drops both occur in every source.
    "sp06_per_source_sample" -> ((s, d) =>
      Splits.tokenBudgetCap(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            lit(1L).as("one")),
          "doc_id", "source", "one", Salt, budget = SampleK,
          buckets = 8)
        .select(col("doc_id"), col("source"))),

    // Epoch upsampling ("epochs per domain"): src0 2.5 epochs, src1
    // exactly 1, src2 0.3, everything else 0.8 — each doc replicated
    // floor(f) times plus a content-hash-chosen extra for frac(f), so
    // realized multiplicities are deterministic on any partitioning.
    "sp07_epoch_upsample" -> ((s, d) =>
      Splits.epochUpsample(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id", "source", Salt, EpochFactors, defaultPct = 80)),

    // DSIR data selection (Xie et al. 2023): pick the docs whose
    // hashed uni+bigram distribution best matches the src0 target
    // slice, by top-n fixed-point importance weight — both model
    // fits in ONE corpus pass, scoring in-row against a 1024-long
    // literal table, selection a TakeOrderedAndProject. Hash-verified
    // end to end because the weight sum is integer arithmetic
    // (order-free). This is the deterministic top-k variant; the
    // Gumbel resampler (sampling ∝ weight, content-hash keys) is the
    // same operator with resample = true, spec-pinned in DsirSpec
    // because its chained-ln keys drift 1–4 ULP across libms.
    "sp08_dsir_select" -> ((s, d) =>
      graft.operators.Dsir.selectTopN(Tables.documents(s, d), "doc_id",
        TextOps.tokenize(col("text")), col("source") === DsirTarget,
        m = DsirBuckets, n = DsirN, salt = Salt, resample = false)),

    // Priority sampling (Duffield–Lund–Thorup): k docs ∝ byte
    // length, without replacement, plus the Horvitz–Thompson
    // estimate whose sum unbiasedly recovers total corpus bytes.
    // q = w/u is one IEEE division on an exact-in-double 52-bit
    // hash, so the oracle agrees bit-for-bit.
    "sp12_priority_sample" -> ((s, d) =>
      Splits.prioritySample(Tables.documents(s, d), "doc_id",
        expr("octet_length(text)"), Salt, k = PriorityK)),

    // Sequence packing — docs laid head-to-tail on a token tape in
    // hash-shuffle order, chunked into seqLen-token training
    // sequences (bin = sequence of the doc's first token, off =
    // position inside it; straddling docs spill into following bins,
    // GPT-style, no padding). The oracle is the naive global
    // running-sum window; the Spark side must reproduce it through
    // the bucketed prefix-offset plan (the only corpus window is
    // bucket-partitioned — at 100 TB a global ORDER BY window is a
    // single-task sort). buckets=8 at fixture scale so bucket
    // boundaries land mid-tape everywhere.
    "sp13_sequence_packing" -> ((s, d) =>
      Splits.packSequences(Tables.documents(s, d), "doc_id",
        size(TextOps.tokenize(col("text"))), Salt,
        seqLen = PackSeqLen, buckets = 8))
  )

  /** sp13's training-sequence length in tokens — far below a source's
    * token mass at every fixture, so bins, in-bin offsets, and
    * straddling docs all occur. */
  private val PackSeqLen = 256L

  /** sp12's sample size — small vs the sf0.001 corpus (600 docs) so
    * the tau threshold is exercised at every fixture. */
  private val PriorityK = 64

  /** sp08's model/selection parameters — shared with its oracle. */
  private val DsirTarget = "src0"
  private val DsirBuckets = 1024
  private val DsirN = 150

  /** sp06's per-source sample size — shared with its oracle. */
  private val SampleK = 15L

  /** Mixing weights for sp03 — shared by the query and its oracle. */
  private val MixRates: Seq[(String, Int)] =
    Seq("src0" -> 80, "src1" -> 50, "src2" -> 10)

  /** sp07's per-source epoch factors in hundredths — shared with its
    * oracle. Exercises floor ≥ 2 + frac, exactly-1 (no hash draw),
    * sub-1, and the default.
    */
  private val EpochFactors: Seq[(String, Int)] =
    Seq("src0" -> 250, "src1" -> 100, "src2" -> 30)

  /** sp04's per-source whitespace-token budget — ~1/3 of a source's
    * total at sf0.01, so keeps and drops both occur in every source.
    */
  private val TokenBudget = 400L

  /** sp10's per-stratum sample size — between the smallest and the
    * biggest LANGUAGE count at the sf0.001/sf0.01 fixtures (64–218),
    * so truncation and keep-all both occur at the gate. */
  private val StratifiedN = 72

  /** DuckDB mirror of [[Splits.hashBucket]]: same md5 string, same
    * 15-hex-char (60-bit, always-positive) prefix, hex→long via
    * CAST('0x'||… AS BIGINT) ≡ Spark's conv(…,16,10) (DedupQueries'
    * established idiom).
    */
  private def bucketSql(idExpr: String): String =
    s"CAST(('0x' || substring(md5($idExpr || '|$Salt'), 1, 15)) AS BIGINT) % 100"

  val oracleSql: Map[String, String] = Map(
    "sp01_hash_split" ->
      s"""SELECT doc_id,
            ${bucketSql("CAST(doc_id AS VARCHAR)")} AS bucket,
            CASE WHEN ${bucketSql("CAST(doc_id AS VARCHAR)")} < 80
                   THEN 'train'
                 WHEN ${bucketSql("CAST(doc_id AS VARCHAR)")} < 90
                   THEN 'val'
                 ELSE 'test' END AS split
          FROM documents""",
    "sp02_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
          WHERE ${bucketSql("lang || ':' || CAST(doc_id AS VARCHAR)")} < 30""",
    "sp03_source_mix" -> {
      val rateCase = MixRates
        .map { case (g, r) => s"WHEN source = '$g' THEN $r" }
        .mkString("CASE ", " ", " ELSE 30 END")
      s"""SELECT doc_id, source FROM documents
          WHERE ${bucketSql("source || ':' || CAST(doc_id AS VARCHAR)")}
                < $rateCase"""
    },
    // rate = min(1, 4/√n_source): sqrt is IEEE-exact and the count is
    // an integer, so the computed double rate is bit-identical in
    // both engines; the compare is against the full 60-bit hash
    "sp09_temperature_mix" ->
      s"""WITH n AS (
            SELECT source, count(*) AS cnt FROM documents GROUP BY source),
          r AS (
            SELECT source, least(1.0, 4.0 / sqrt(cnt)) AS rate FROM n)
          SELECT d.doc_id, d.source
          FROM documents d JOIN r USING (source)
          WHERE CAST(CAST(('0x' || substring(md5(d.source || ':' ||
                  CAST(d.doc_id AS VARCHAR) || '|$Salt'), 1, 15))
                  AS BIGINT) AS DOUBLE)
                < rate * 1152921504606846976.0""",
    // sp10: the heap's (52-bit priority, id) order IS row_number
    // order — same md5 slice, exact in a double on the Spark side
    "sp10_stratified_exact" ->
      s"""WITH r AS (
            SELECT lang AS stratum, doc_id,
              CAST(('0x' || substring(md5(lang || ':' ||
                CAST(doc_id AS VARCHAR) || '|$Salt'), 1, 13))
                AS BIGINT) AS pr
            FROM documents),
          w AS (
            SELECT stratum, doc_id,
              row_number() OVER (PARTITION BY stratum
                                 ORDER BY pr, doc_id) AS rn
            FROM r)
          SELECT stratum, doc_id AS id, CAST(rn AS INTEGER) AS rank
          FROM w WHERE rn <= $StratifiedN""",
    // sp11: same 52-bit pair hash (exact in a double), rank within
    // anchor by (hash, id) — the heap's tie order
    "sp11_contrastive_negatives" ->
      """WITH a AS (
            SELECT vec_id AS q_id, label AS a_label
            FROM embeddings WHERE vec_id < 50),
          p AS (
            SELECT a.q_id, e.vec_id AS n_id,
                   CAST(CAST(('0x' || substring(
                     md5(a.q_id || '_' || e.vec_id), 1, 13))
                     AS BIGINT) AS DOUBLE) AS rk
            FROM embeddings e, a WHERE e.label <> a.a_label)
          SELECT q_id, n_id, rk,
                 CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY rk, n_id) AS INTEGER) AS rn
          FROM p QUALIFY rn <= 5""",
    // sp12: same 52-bit slice → u=(h+1)/2^52, q=w/u — every step a
    // correctly-rounded IEEE op on exact-in-double integers, so the
    // top-(k+1) order, tau, and greatest(w,tau) match bit-for-bit.
    "sp12_priority_sample" ->
      s"""WITH p AS (
            SELECT doc_id,
                   CAST(strlen(text) AS DOUBLE) AS w,
                   CAST(strlen(text) AS DOUBLE) /
                     ((CAST(CAST(('0x' || substring(
                         md5(CAST(doc_id AS VARCHAR) || '|$Salt'),
                         1, 13)) AS BIGINT) AS DOUBLE) + 1.0)
                      / 4503599627370496.0) AS q
            FROM documents),
          t AS (
            SELECT * FROM p ORDER BY q DESC, doc_id
            LIMIT ${PriorityK + 1}),
          m AS (SELECT min(q) AS tau FROM t)
          SELECT doc_id, w, greatest(w, tau) AS w_hat
          FROM t, m WHERE q > tau""",
    // The oracle states the SEMANTICS (one exact running-sum window
    // in hash-priority order); the Spark side must produce the same
    // set through its bucketed two-level plan.
    "sp04_token_budget" ->
      s"""WITH r AS (
            SELECT doc_id, source,
                   CAST(len(list_filter(string_split(text, ' '),
                     w -> len(w) > 0)) AS BIGINT) AS n_tokens,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                     || '|$Salt'), 1, 15)) AS BIGINT) AS rk
            FROM documents),
          c AS (
            SELECT doc_id, source, n_tokens,
                   coalesce(sum(n_tokens) OVER (PARTITION BY source
                     ORDER BY rk, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cum_before
            FROM r)
          SELECT doc_id, source, n_tokens FROM c
          WHERE cum_before < $TokenBudget""",
    // sp13: the naive form — ONE global running-sum window in
    // (hash, id) tape order, then integer div/mod into bins
    "sp13_sequence_packing" ->
      s"""WITH r AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '),
                     w -> len(w) > 0)) AS BIGINT) AS n_tokens,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                     || '|$Salt'), 1, 15)) AS BIGINT) AS rk
            FROM documents),
          c AS (
            SELECT doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (ORDER BY rk, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS tape
            FROM r)
          SELECT doc_id, n_tokens,
                 CAST(tape // $PackSeqLen AS BIGINT) AS bin,
                 CAST(tape % $PackSeqLen AS BIGINT) AS off
          FROM c""",
    // the oracle is the naive single-window form of the same total
    // order (rk, doc_id); the Spark side must reproduce it through
    // its bucketed prefix-offset plan
    "sp05_shuffle_rank" ->
      s"""WITH r AS (
            SELECT doc_id,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                     || '|$Salt'), 1, 15)) AS BIGINT) AS rk
            FROM documents)
          SELECT doc_id,
                 row_number() OVER (ORDER BY rk, doc_id) - 1
                   AS shuffle_pos
          FROM r""",
    // sp07: same factor CASE and hash draw; the replication mirrors
    // posexplode as unnest(range(n)) — n = 0 drops the row both ways
    "sp07_epoch_upsample" -> {
      val fCase = EpochFactors
        .map { case (g, r) => s"WHEN source = '$g' THEN $r" }
        .mkString("CASE ", " ", " ELSE 80 END")
      s"""WITH r AS (
            SELECT doc_id, source,
                   $fCase // 100
                   + CASE WHEN ${bucketSql(
                       "source || ':' || CAST(doc_id AS VARCHAR)")}
                          < $fCase % 100
                     THEN 1 ELSE 0 END AS n
            FROM documents)
          SELECT doc_id, source,
                 CAST(unnest(range(n)) AS INTEGER) AS copy
          FROM r"""
    },
    // sp08: the exact fixed-point DSIR chain — bucket counts for raw
    // and target in one pass, Laplace-smoothed ln ratios quantized to
    // the 2^24 grid (floor after one multiply — exact both engines),
    // per-doc INTEGER weight sums (order-free, so SQL's unordered
    // SUM matches Spark's sequential fold bit-for-bit), dequantize by
    // an exact power-of-two divide, deterministic Gumbel keys from
    // the same 52-bit md5 uniform as the Spark side
    "sp08_dsir_select" ->
      s"""WITH toks AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, ' '),
                     w -> len(w) > 0) AS t
            FROM documents),
          feats AS (
            SELECT doc_id, source,
                   list_concat(t,
                     CASE WHEN len(t) >= 2
                          THEN list_transform(
                            list_zip(list_slice(t, 1, len(t) - 1),
                                     list_slice(t, 2, len(t))),
                            p -> p[1] || '_' || p[2])
                          ELSE CAST([] AS VARCHAR[]) END) AS f
            FROM toks),
          fb AS (
            SELECT doc_id, source,
                   unnest(list_transform(f,
                     x -> CAST(('0x' || substring(md5(x), 1, 8))
                       AS BIGINT) % $DsirBuckets)) AS b
            FROM feats),
          cnt AS (
            SELECT b, count(*) AS cr,
                   sum(CASE WHEN source = '$DsirTarget'
                       THEN 1 ELSE 0 END) AS ct
            FROM fb GROUP BY b),
          tot AS (
            SELECT CAST(sum(cr) AS BIGINT) AS totr,
                   CAST(sum(ct) AS BIGINT) AS tott
            FROM cnt),
          ratio AS (
            SELECT b,
                   CAST(floor((
                     ln(CAST(ct + 1 AS DOUBLE) /
                        CAST(tott + $DsirBuckets AS DOUBLE))
                   - ln(CAST(cr + 1 AS DOUBLE) /
                        CAST(totr + $DsirBuckets AS DOUBLE)))
                     * 16777216.0) AS BIGINT) AS qr
            FROM cnt, tot),
          w AS (
            SELECT t.doc_id, coalesce(s.q, 0) AS q
            FROM toks t LEFT JOIN (
              SELECT fb.doc_id, CAST(sum(qr) AS BIGINT) AS q
              FROM fb JOIN ratio USING (b)
              GROUP BY fb.doc_id) s USING (doc_id))
          SELECT doc_id AS id, CAST(q AS DOUBLE) / 16777216.0 AS logw
          FROM w
          ORDER BY logw DESC, id LIMIT $DsirN""",
    // unit costs ⇒ the running-sum semantics reduce to per-source
    // row_number ≤ K in (rk, doc_id) priority order
    "sp06_per_source_sample" ->
      s"""WITH r AS (
            SELECT doc_id, source,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                     || '|$Salt'), 1, 15)) AS BIGINT) AS rk
            FROM documents),
          n AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                     ORDER BY rk, doc_id) AS rn
            FROM r)
          SELECT doc_id, source FROM n WHERE rn <= $SampleK"""
  )
}
