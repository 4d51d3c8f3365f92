package graft.features

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Csv
import graft.gd.SparseDoc
import graft.text.TextOps

/** Stack B featurization, end to end (SURVEY.md §3.2 prep):
  * CSV → RDD-flavor tokenize chain → top-K vocabulary → sparse
  * TF-IDF Dataset ready for the GD loop.
  *
  * One shuffle chain instead of the reference's four (flatMap-distinct
  * -join-groupByKey with both sides shuffled): the ≤K-row vocabulary
  * broadcasts, the big side shuffles once for the per-doc group-by.
  * The featurized Dataset is persisted — the reference recomputes the
  * entire tokenize+TF-IDF lineage on every one of its 300 iterations
  * (SURVEY.md §2.10 R2).
  */
object RddPipeline {

  final case class Featurized(
      tokenized: DataFrame,       // (id, label, tokens) — persisted
      vocab: DataFrame,           // (word, cnt, id) — id = rank 0..K-1
      data: Dataset[SparseDoc],   // persisted
      numberOfTweets: Long) {
    /** Free both persisted frames once training/eval is done — the
      * pin-release handle of this featurization (persist-backed, so
      * a late re-read silently recomputes rather than failing). */
    def release(): Unit = { tokenized.unpersist(); data.unpersist(); () }
  }

  /** (id, label, tokens) via the RDD-stack tokenizer chain
    * (`RDD_logisticregression.py:44-57,192`).
    */
  def tokenize(spark: SparkSession, csvPath: String): DataFrame =
    Csv.tweets(spark, csvPath).select(
      col("id"),
      col("class").as("label"),
      TextOps.rddTokens(col("text")).as("tokens"))

  /** Full featurization. `dictFilter` restricts the *dictionary* to
    * one class (RDD_NN.py:320-322 builds its 1000-word vocabulary
    * from disaster tweets only) while TF-IDF still runs over all docs.
    */
  def featurize(spark: SparkSession, csvPath: String, dim: Int = 10000,
                dictFilter: Option[String] = None): Featurized = {
    val toks = tokenize(spark, csvPath)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dictSource = dictFilter match {
      case Some(lbl) => toks.filter(col("label") === lbl)
      case None      => toks
    }
    val vocab = Vocabulary.topK(dictSource, "tokens", dim)
    val data = TfIdf.transform(toks, "id", "label", "tokens", vocab,
        dim, exactParity = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    Featurized(toks, vocab, data, toks.count())
  }

  /** Words for dictionary ids, driver-side (T2/P5:
    * `RDD_logisticregression.py:172`).
    */
  def wordsFor(vocab: DataFrame, ids: Seq[Int]): Seq[String] =
    vocab.filter(col("id").isin(ids: _*))
      .select(col("word")).collect().map(_.getString(0)).toSeq
}
