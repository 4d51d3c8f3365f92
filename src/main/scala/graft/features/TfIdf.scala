package graft.features

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.gd.SparseDoc

/** Native TF-IDF (Stack B parity; SURVEY.md §2.3/§2.4 J1/J2/A4–A7).
  *
  * Reproduces the reference's exact semantics including the
  * binary-presence quirk (SURVEY.md §2.3 note): `get_tfArray` flatMaps
  * every occurrence but `distinct()`s `(word, (doc,label,len))` tuples
  * before counting, so TF(w,d) = 1[w∈d]/|d| — presence, not count.
  * `exactParity=false` computes the standard count(w,d)/|d|.
  *
  * IDF is the *unsmoothed* `ln(N/df)` (`RDD_logisticregression.py:98`),
  * not `ml.feature.IDF`'s `ln((N+1)/(df+1))`.
  *
  * Scale shape: explode → in-row distinct (when parity) → broadcast
  * join against the ≤K-row vocabulary (the reference shuffles both
  * sides) → one groupBy(doc) to assemble sparse vectors. DF counts
  * ride the same grouped pass (relational `groupBy("id").count`),
  * replacing the reference's 10k-dim dense-vector `reduce` to the
  * driver (A6) — at 100 TB a dense vector reduce is a driver
  * bottleneck; a word-keyed count aggregates map-side.
  */
object TfIdf {

  /** (docId, label, len, pos) — one row per distinct (doc, vocab word)
    * when exactParity, else per (doc, word, count).
    */
  private def docWordPositions(docs: DataFrame, idCol: String,
      labelCol: String, tokensCol: String, vocab: DataFrame,
      exactParity: Boolean): DataFrame = {
    val withCnt =
      if (exactParity)
        // binary presence (J2 quirk): the reference's distinct() runs
        // over (word,(doc,label,len)) tuples, where doc/label/len are
        // constant per row — so an IN-ROW array_distinct before the
        // explode is semantically identical and replaces a full
        // shuffle of every token occurrence with per-row dedup.
        docs.select(
          col(idCol).as("doc_id"),
          col(labelCol).as("label"),
          size(col(tokensCol)).as("len"),
          explode(array_distinct(col(tokensCol))).as("word"))
          .withColumn("w_cnt", lit(1L))
      else
        docs.select(
          col(idCol).as("doc_id"),
          col(labelCol).as("label"),
          size(col(tokensCol)).as("len"),
          explode(col(tokensCol)).as("word"))
          .groupBy("doc_id", "label", "len", "word")
          .agg(count(lit(1)).as("w_cnt"))
    // inner join = implicit vocabulary filter (J1); vocab is tiny →
    // broadcast hash join, no shuffle of the big side
    withCnt.join(broadcast(vocab.select(col("word"), col("id"))), "word")
  }

  /** Featurize to sparse TF-IDF vectors.
    *
    * @param vocab output of [[Vocabulary.topK]] — (word, cnt, id)
    * @param labelValue maps the string label to 0/1 (reference
    *   compares strings: `x[1] == '1'`)
    */
  def transform(docs: DataFrame, idCol: String, labelCol: String,
      tokensCol: String, vocab: DataFrame, dim: Int,
      exactParity: Boolean = true): Dataset[SparseDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._

    val dwp = docUvocab(docs, idCol, labelCol, tokensCol, vocab,
      exactParity)

    // DF per vocab word: docs containing it (presence, matching the
    // reference's 0/1-vector reduce), then IDF = ln(N/df).
    val n = docs.count().toDouble
    val idf = dwp.groupBy(col("id")).agg(
        countDistinct(col("doc_id")).as("df"))
      .select(col("id"), log(lit(n) / col("df").cast("double")).as("idf"))

    dwp.join(broadcast(idf), "id")
      .withColumn("tfidf",
        col("w_cnt").cast("double") / col("len").cast("double") *
          col("idf"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sort_array(collect_list(struct(col("id"), col("tfidf"))))
        .as("pairs"))
      .select(
        col("doc_id").cast("string").as("id"),
        when(col("label") === "1", 1.0).otherwise(0.0).as("label"),
        col("pairs.id").as("indices"),
        col("pairs.tfidf").as("values"))
      .as[SparseDoc]
  }

  private def docUvocab(docs: DataFrame, idCol: String, labelCol: String,
      tokensCol: String, vocab: DataFrame,
      exactParity: Boolean): DataFrame =
    docWordPositions(docs, idCol, labelCol, tokensCol, vocab, exactParity)
}
