package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.features.{TfIdf, Vocabulary}
import graft.text.TextOps

/** Stack B featurization operators, DuckDB-verified on the synthetic
  * `documents` table (SURVEY.md §2.4 A1–A7): top-K vocabulary with
  * rank ids, per-word document frequency + unsmoothed IDF, and the
  * full TF-IDF transform *through the production `TfIdf.transform`
  * path* — including the reference's binary-presence TF quirk
  * (SURVEY.md §2.3 note: TF(w,d) = 1[w∈d]/|d|, not count/|d|).
  *
  * K=20 < the corpus' 31 distinct words, so the top-K boundary and
  * the (cnt desc, word asc) tie-break are genuinely exercised.
  */
object FeatureQueries {
  type Q = (SparkSession, String) => DataFrame

  private val K = 20

  private def tokenized(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("lang").as("label"), // pseudo-label; unused in outputs
      TextOps.tokenize(col("text")).as("tokens"))

  private def vocab(s: SparkSession, d: String): DataFrame =
    Vocabulary.topK(tokenized(s, d), "tokens", K)

  val queries: Map[String, Q] = Map(
    // A1–A3: word-count agg → top-K → rank-id assignment.
    "f01_vocab_topk" -> ((s, d) => vocab(s, d)),

    // A6/A7: per-vocab-word document frequency + unsmoothed ln(N/df).
    "f02_docfreq_idf" -> ((s, d) => {
      val toks = tokenized(s, d)
      val n = toks.count().toDouble
      toks.select(col("doc_id"),
          explode(array_distinct(col("tokens"))).as("word"))
        .join(broadcast(vocab(s, d).select(col("word"), col("id"))),
          "word")
        .groupBy(col("id"), col("word"))
        .agg(count(lit(1)).as("df"))
        .select(col("id"), col("word"), col("df"),
          round(log(lit(n) / col("df").cast("double")), 6).as("idf"))
    }),

    // J1/J2/A4/A5/A7: the production TfIdf.transform output (binary
    // -presence TF quirk included), exploded back to rows for the
    // oracle compare. Restricted to doc_id < 100 — constant rows
    // across sf.
    "f03_tfidf" -> ((s, d) => {
      val toks = tokenized(s, d)
      val data = TfIdf.transform(toks, "doc_id", "label", "tokens",
        vocab(s, d), K, exactParity = true)
      data.toDF()
        .filter(col("id").cast("long") < 100)
        .select(col("id").as("doc_id"),
          explode(arrays_zip(col("indices"), col("values"))).as("iv"))
        .select(col("doc_id"), col("iv.indices").as("word_id"),
          round(col("iv.values"), 6).as("tfidf"))
    }),

    // f03 gated by the deterministic 80% content-hash train split —
    // hash-verifies the exact sparse matrix a training run consumes
    // after featurize→split. (m07 itself keeps Spark's seeded
    // `randomSplit` for reference parity; that RNG is engine-internal
    // and inherently un-oracle-able, so the verified split here is
    // the hash split a 100 TB pipeline would use — sp01's basis.)
    "f04_train_matrix" -> ((s, d) => {
      val toks = tokenized(s, d)
      val data = TfIdf.transform(toks, "doc_id", "label", "tokens",
        vocab(s, d), K, exactParity = true)
      data.toDF()
        .filter(col("id").cast("long") < 100)
        .filter(graft.operators.Splits.hashBucket(col("id"),
          "graft-split", 100) < 80)
        .select(col("id").as("doc_id"),
          explode(arrays_zip(col("indices"), col("values"))).as("iv"))
        .select(col("doc_id"), col("iv.indices").as("word_id"),
          round(col("iv.values"), 6).as("tfidf"))
    }),

    // Hashing-trick TF (the vocabulary-free featurization): token →
    // md5-prefix bucket, per-(doc, bucket) counts. No dictionary
    // aggregation, no broadcast — a single stateless pass, the shape
    // that never synchronizes at corpus scale. HashBuckets=32 < the
    // 31-word vocabulary, so bucket collisions (summed counts) are
    // genuinely exercised; the xxhash64 production profile is
    // spec-verified against this one on hash-independent invariants.
    "f05_feature_hashing" -> ((s, d) =>
      graft.features.FeatureHashing.hashedTf(tokenized(s, d),
        "doc_id", col("tokens"), HashBuckets))
  )

  /** f05's bucket count — shared with its oracle. */
  private val HashBuckets = 32

  private val tokSql =
    "list_filter(string_split(text, ' '), w -> len(w) > 0)"

  private val vocabCte =
    s"""tok AS (
          SELECT doc_id, len($tokSql) AS len,
                 unnest(list_distinct($tokSql)) AS word
          FROM documents),
        counts AS (
          SELECT t.word, count(*) AS cnt FROM (
            SELECT doc_id, unnest($tokSql) AS word FROM documents) t
          GROUP BY 1),
        vocab AS (
          SELECT word, cnt,
                 CAST(row_number() OVER (ORDER BY cnt DESC, word ASC)
                      - 1 AS INTEGER) AS id
          FROM counts ORDER BY cnt DESC, word ASC LIMIT $K),
        n AS (SELECT count(*) AS n FROM documents)"""

  val oracleSql: Map[String, String] = Map(
    // CAST('0x'||…) hex→long ≡ Spark's conv(…,16,10) (sp01's idiom)
    "f05_feature_hashing" ->
      s"""SELECT doc_id,
            CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT)
              % $HashBuckets AS bucket,
            CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest($tokSql) AS w FROM documents)
          GROUP BY 1, 2""",
    "f01_vocab_topk" ->
      s"""WITH $vocabCte SELECT word, cnt, id FROM vocab""",
    "f02_docfreq_idf" ->
      s"""WITH $vocabCte
          SELECT v.id, v.word, count(*) AS df,
                 round(ln((SELECT n FROM n) / CAST(count(*) AS DOUBLE)), 6) AS idf
          FROM tok JOIN vocab v USING (word)
          GROUP BY v.id, v.word""",
    "f03_tfidf" ->
      s"""WITH $vocabCte
          SELECT doc_id, word_id, tfidf FROM (
            SELECT CAST(tok.doc_id AS VARCHAR) AS doc_id,
                   tok.doc_id AS doc_num, v.id AS word_id,
                   round(1.0 / tok.len *
                     ln((SELECT n FROM n) /
                        CAST(count(*) OVER (PARTITION BY v.id) AS DOUBLE)),
                     6) AS tfidf
            FROM tok JOIN vocab v USING (word))
          WHERE doc_num < 100""",
    "f04_train_matrix" ->
      s"""WITH $vocabCte
          SELECT doc_id, word_id, tfidf FROM (
            SELECT CAST(tok.doc_id AS VARCHAR) AS doc_id,
                   tok.doc_id AS doc_num, v.id AS word_id,
                   round(1.0 / tok.len *
                     ln((SELECT n FROM n) /
                        CAST(count(*) OVER (PARTITION BY v.id) AS DOUBLE)),
                     6) AS tfidf
            FROM tok JOIN vocab v USING (word))
          WHERE doc_num < 100
            AND CAST(('0x' || substring(md5(CAST(doc_num AS VARCHAR)
                  || '|graft-split'), 1, 15)) AS BIGINT) % 100 < 80"""
  )
}
