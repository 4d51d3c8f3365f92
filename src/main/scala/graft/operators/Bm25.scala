package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a tokenized corpus (Robertson &
  * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
  * Beyond"; the IDF uses the Lucene-style `ln(1 + (N-df+0.5)/(df+0.5))`
  * form, which keeps rare-term weights positive).
  *
  * Spark-first shape for a short query against a 100 TB corpus:
  *  - corpus statistics (N, avgdl, per-term df) are ONE partial-
  *    aggregated pass producing a single row, broadcast back via a
  *    `crossJoin(broadcast(stats))` — fully declarative, no driver
  *    round-trip, no data-dependent plan literals;
  *  - per-document term frequencies and the score are computed
  *    in-row inside the scan stage (the query's terms are plan
  *    literals — a query is a few words, nothing like the
  *    [[graft.core.PlanLiterals]] ceilings);
  *  - the final top-k is `orderBy(score desc, id).limit(k)` — Spark
  *    plans that as TakeOrderedAndProject (per-partition bounded
  *    top-k + driver merge), so the corpus never globally sorts and
  *    never shuffles: shuffle volume is k rows per partition.
  *
  * Every arithmetic step is fixed-order IEEE double math mirrored
  * 1:1 by the DuckDB oracle (the t12 unigram-LM discipline); ties
  * break by ascending doc id.
  */
object Bm25 {

  /** Top-k documents for one literal query.
    *
    * @param docs    corpus
    * @param idCol   document id column name
    * @param tokens  token-array expression (bound to its own
    *                projected column internally — the token-binding
    *                rule; it is read once per term plus once for dl)
    * @param terms   query terms (plan literals)
    */
  def topK(docs: DataFrame, idCol: String, tokens: Column,
           terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      s"bm25 wants 1..64 literal query terms, got ${terms.size}")
    val toks = docs.select(col(idCol).as("doc_id"), tokens.as("__toks"))
    val statAggs =
      count(lit(1)).cast("double").as("n") +:
      avg(size(col("__toks"))).as("avgdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("__toks"), lit(t)), 1).otherwise(0))
          .cast("double").as(s"df$i")
      }
    val stats = toks.agg(statAggs.head, statAggs.tail: _*)
    val dl = size(col("__toks")).cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("__toks"), x => x === lit(t))).cast("double")
      val idf = log(lit(1.0) +
        (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      idf * tf * lit(k1 + 1) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * dl / col("avgdl")))
    }.reduce(_ + _)
    toks.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
