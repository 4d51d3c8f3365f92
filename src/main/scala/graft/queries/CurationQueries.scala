package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.operators.Curation
import graft.text.Analysis

/** The composite corpus-curation funnel (langid → quality gates →
  * exact dedup keep-first → token budgeting) as one oracle-checked
  * query — proving the individually-verified text/dedup operators
  * compose into the actual pre-training pipeline with identical
  * results end to end.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "c01_curate_corpus" -> ((s, d) =>
      Curation.curate(Tables.documents(s, d), "doc_id", "text",
        keepLang = "en", minTokens = 20, minTtr = 0.35))
  )

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => "'" + x.replace("'", "''") + "'").mkString("[", ", ", "]")

  private val tokSql =
    "list_filter(string_split(text, ' '), w -> len(w) > 0)"

  /** langid CTE body — same marker sets / priority tie-break as
    * [[Analysis.langId]] (mirrors TextQueries' t04 oracle). */
  private val langCase: String = {
    val names = Analysis.LangMarkers.map(_._1)
    val best = names.map(l => s"h_$l").mkString("greatest(", ", ", ")")
    val cases = names
      .map(l => s"WHEN h_$l = $best AND h_$l > 0 THEN '$l'")
      .mkString(" ")
    s"CASE $cases ELSE 'und' END"
  }

  private val hitCols: String = Analysis.LangMarkers
    .map { case (l, ms) =>
      s"len(list_filter(toks, t -> list_contains(${sqlList(ms)}, t))) AS h_$l"
    }
    .mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "c01_curate_corpus" ->
      s"""WITH t AS (
            SELECT doc_id, text, $tokSql AS toks FROM documents),
          hits AS (
            SELECT doc_id, text, toks, $hitCols FROM t),
          scored AS (
            SELECT doc_id,
                   $langCase AS lang_pred,
                   CAST(len(toks) AS INTEGER) AS n_tokens,
                   CASE WHEN len(toks) > 0
                     THEN round(CAST(len(list_distinct(toks)) AS DOUBLE)
                          / CAST(len(toks) AS DOUBLE), 6)
                     ELSE 0.0 END AS ttr,
                   CAST(len(regexp_extract_all(text,
                     '${Analysis.BpeIshRe.replace("'", "''")}'))
                     AS INTEGER) AS bpe_tokens,
                   md5(text) AS fp
            FROM hits),
          kept AS (
            SELECT * FROM scored
            WHERE lang_pred = 'en' AND n_tokens >= 20 AND ttr >= 0.35)
          SELECT doc_id, lang_pred, n_tokens, ttr, bpe_tokens, fp
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY fp ORDER BY doc_id) AS rk FROM kept)
          WHERE rk = 1"""
  )
}
