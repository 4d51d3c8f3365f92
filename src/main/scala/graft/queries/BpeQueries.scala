package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Bpe
import graft.text.TextOps

/** BPE tokenizer-training pack over the `documents` table — see
  * [[graft.operators.Bpe]] for the operator and its scale shape.
  *
  * Oracle note: the trainer is iterative, but the iteration count is
  * a fixed config, so the whole fit unrolls into a DuckDB CTE chain
  * (one pair-count + argmax + replace round per CTE triple — the same
  * unrolled-fixed-point pattern as e18's iterated k-means). Both
  * engines break pair-frequency ties by (lhs, rhs) ascending and
  * apply merges via leftmost-non-overlapping plain `replace`, so the
  * learned rules — and every downstream encoding — are exact-equal.
  */
object BpeQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Merge rounds the queries train. Bounded by design: each round is
    * one vocab-sized shuffle in Spark and one CTE triple in the
    * oracle SQL.
    */
  val NumMerges = 12

  /** Corpus tokenizer: `clean` (lowercase, strip URLs/@mentions, all
    * non-letters → space) before `tokenize` — this is what upholds
    * Bpe's no-`#`-in-tokens caller contract for ANY corpus content,
    * not just the letters-only fixtures, and it normalizes every
    * whitespace run to single spaces so the oracle's space-split
    * tokenizer below is exactly equivalent.
    */
  private def bpeTokens(text: org.apache.spark.sql.Column) =
    TextOps.tokenize(TextOps.clean(text))

  /** Oracle mirror of [[bpeTokens]]: the Catalyst `clean` chain
    * re-expressed for DuckDB (RE2 — char-equivalent on BMP text, the
    * MlQueries.cleanSql argument), then split on the single space
    * `clean` guarantees. Empty tokens dropped on both sides.
    */
  private val cleanSql =
    """ltrim(regexp_replace(regexp_replace(lower(text),
       '(?:@|https?://)\S+', '', 'g'), '[^a-zA-Z]', ' ', 'g'))"""
  private val tokSql =
    s"list_filter(string_split($cleanSql, ' '), w -> len(w) > 0)"

  /** One training per fixture dir: the learned rules are a tiny
    * session-independent Seq (driver data, deterministic in the
    * input), so bpe02 reuses bpe01's fit instead of re-running the
    * merge loop — the warmFeaturized discipline from the ML pack.
    */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Bpe.Merge]]()
  private def trainedMerges(s: SparkSession, d: String): Seq[Bpe.Merge] =
    mergeCache.computeIfAbsent(d, dir =>
      Bpe.trainMerges(Tables.documents(s, dir),
        bpeTokens(col("text")), NumMerges))

  val queries: Map[String, Q] = Map(
    // Train: corpus → word-freq vocab (one shuffle) → 12 argmax+merge
    // rounds (vocab-sized each) → the learned rule table.
    "bpe01_train_merges" -> ((s, d) => {
      import s.implicits._
      trainedMerges(s, d).toDF().select(
        $"rank".as("merge_rank"), $"lhs", $"rhs", $"freq")
    }),

    // Encode: apply the learned rules corpus-wide as chained in-row
    // replaces — zero-shuffle scan, the 100 TB path.
    "bpe02_encode_pieces" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val toks = bpeTokens($"text")
      val merges = trainedMerges(s, d)
      docs.select(
        $"doc_id",
        size(toks).as("n_tokens"),
        Bpe.pieceCount(toks, Bpe.encodeKernel(toks, merges))
          .as("n_pieces"))
    }),

    // Decode round-trip: decode(encode(toks)) must reproduce the
    // cleaned token stream for EVERY document — the losslessness
    // property that lets a pipeline store the encoded column and
    // reconstruct text on demand. In-row, zero-shuffle; the flag is
    // oracle-asserted TRUE (q17 band discipline: a broken round-trip
    // fails the gate, not just a spec).
    "bpe04_decode_roundtrip" -> ((s, d) => {
      val merges = trainedMerges(s, d)
      Tables.documents(s, d)
        .withColumn("__toks", bpeTokens(col("text")))
        .select(col("doc_id"),
          size(col("__toks")).as("n_tokens"),
          (Bpe.decode(Bpe.encodeKernel(col("__toks"), merges)) ===
            array_join(col("__toks"), " ")).as("roundtrip_ok"))
    }),

    // Vocab dump: the trained subword inventory with corpus
    // occurrence counts — the artifact a tokenizer ships. Same shape
    // as training's word-freq reduce plus one in-row encode.
    "bpe03_vocab" -> ((s, d) => {
      import s.implicits._
      val merges = trainedMerges(s, d)
      Tables.documents(s, d)
        .select(explode(bpeTokens($"text")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("freq"))
        .select(explode(Bpe.symbols(
            Bpe.encodeKernel(array($"word"), merges))).as("piece"),
          $"freq")
        .groupBy($"piece").agg(sum($"freq").as("occurrences"))
    }))

  /** CTE chain: v0 = char-marked word-freq vocab; per round k,
    * p_k = adjacent-pair counts, b_k = argmax rule, v_k = vocab with
    * the rule applied.
    */
  private def mergeCtes(n: Int): String = {
    val sb = new StringBuilder
    // NB: no generated line may start with "||" — these fragments are
    // interpolated into outer stripMargin templates, and a second
    // stripMargin pass would eat the first pipe of a leading "||".
    sb.append(
      s"""v0 AS MATERIALIZED (
         |  SELECT concat('#',
         |    array_to_string(string_split(word, ''), '##'), '#') AS marked,
         |         count(*) AS freq
         |  FROM (SELECT unnest($tokSql) AS word FROM documents)
         |  GROUP BY 1)""".stripMargin)
    // b_k is TOTAL: if round k has no adjacent pairs left (p_k empty
    // — the vocabulary merged down to single symbols), it yields the
    // sentinel rule ('', '', pf=-1) instead of zero rows. The
    // sentinel's replace pattern '#####' needs five consecutive '#',
    // and a marked vocab row has runs of at most two ('##' between
    // symbols, single '#' at the boundaries), so applying it is a
    // no-op — v_k = v_{k-1} instead of the empty frame that would
    // otherwise zero every downstream CTE. Real pair frequencies are
    // always >= 1, so `ORDER BY pf DESC` prefers any real pair and
    // `WHERE pf > 0` (bpe01) drops sentinels, matching Spark's
    // early-stopped rule list exactly.
    for (k <- 1 to n) sb.append(
      s""",
         |p$k AS MATERIALIZED (
         |  SELECT syms[i] AS lhs, syms[i + 1] AS rhs, sum(freq) AS pf
         |  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
         |        FROM (SELECT freq,
         |                string_split(trim(marked, '#'), '##') AS syms
         |              FROM v${k - 1}))
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (
         |  SELECT lhs, rhs, pf FROM (
         |    SELECT lhs, rhs, pf FROM p$k
         |    UNION ALL SELECT '', '', CAST(-1 AS HUGEINT))
         |  ORDER BY pf DESC, lhs ASC, rhs ASC LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT replace(marked, '#' || lhs || '##' || rhs || '#',
         |                 '#' || lhs || rhs || '#') AS marked, freq
         |  FROM v${k - 1}, b$k)""".stripMargin)
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    "bpe01_train_merges" -> {
      val rows = (1 to NumMerges).map(k =>
        s"""SELECT CAST($k AS INTEGER) AS merge_rank, lhs, rhs,
           |       CAST(pf AS BIGINT) AS freq FROM b$k
           |WHERE pf > 0""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"WITH ${mergeCtes(NumMerges)}\nSELECT * FROM (\n$rows)"
    },
    "bpe03_vocab" ->
      s"""WITH ${mergeCtes(NumMerges)}
         |SELECT piece, CAST(sum(freq) AS BIGINT) AS occurrences
         |FROM (SELECT unnest(string_split(trim(marked, '#'), '##'))
         |        AS piece, freq
         |      FROM v$NumMerges)
         |GROUP BY 1""".stripMargin,
    // bpe04: the oracle asserts the round-trip HOLDS (token counts
    // from the mirrored tokenizer; flag literal TRUE) — a decode that
    // loses or mangles a single document hash-fails the gate
    "bpe04_decode_roundtrip" ->
      s"""SELECT doc_id, CAST(len($tokSql) AS INTEGER) AS n_tokens,
          TRUE AS roundtrip_ok FROM documents""",
    "bpe02_encode_pieces" -> {
      val froms = (1 to NumMerges).map(k => s"b$k AS m$k").mkString(", ")
      val enc = (1 to NumMerges).foldLeft("dm.marked")((c, k) =>
        s"""replace($c, '#' || m$k.lhs || '##' || m$k.rhs || '#',
           |  '#' || m$k.lhs || m$k.rhs || '#')""".stripMargin)
      s"""WITH ${mergeCtes(NumMerges)},
         |dm AS MATERIALIZED (
         |  SELECT doc_id, len(toks) AS n_tokens,
         |         array_to_string(list_transform(toks,
         |           w -> '#' || array_to_string(string_split(w, ''), '##')
         |                  || '#'), ' ') AS marked
         |  FROM (SELECT doc_id, $tokSql AS toks FROM documents))
         |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
         |  CAST(n_tokens +
         |    (length(enc) - length(replace(enc, '##', ''))) // 2
         |    AS INTEGER) AS n_pieces
         |FROM (SELECT dm.doc_id, dm.n_tokens, $enc AS enc
         |      FROM dm, $froms)""".stripMargin
    })
}
