package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Csv, Sessions}
import graft.text.{Lemmatizer, TextOps}

/** Quantifies the lemmatizer's divergence surface vs NLTK's
  * WordNet-backed morphy (which this container cannot run — no wordnet
  * data), over the full train.csv vocabulary.
  *
  * Method: NLTK only returns a detached form when the candidate exists
  * in the WordNet noun lexicon, otherwise the word passes through
  * unchanged. Our rules always detach. So the at-risk set is exactly
  * the words we transform whose result never occurs as a corpus token
  * itself — "fires"→"fire" is corroborated by "fire" appearing 250×,
  * while "texas"→"texa" produces a token the corpus has never seen
  * (strong signal the lexicon would have rejected the detachment).
  * Corroborated detachments match NLTK by construction for real
  * plurals; the uncorroborated ones bound the true divergence rate.
  */
object LemmaAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-lemma-audit", "8")
    import spark.implicits._

    // tokenize WITHOUT lemmatization: clean → split → stop-filter
    // (the RDD-stack chain minus its final lemmatize step)
    val pre = Csv.tweets(spark, Csv.TrainCsv)
      .select(col("class").as("label"),
        TextOps.removeStopwords(
          TextOps.tokenize(TextOps.clean(col("text"))),
          (TextOps.EnglishStopwords ++ TextOps.ExtraStopwordsRdd)
            .distinct).as("toks"))
      .select(col("label"), explode(col("toks")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val vocabSize = pre.size
    val transformed = pre.keys.toSeq
      .map(w => (w, Lemmatizer.lemma(w)))
      .filter { case (w, l) => l != w }
    val uncorroborated = transformed
      .filterNot { case (_, l) => pre.contains(l) }
      .sortBy { case (w, _) => -pre(w) }

    val totalTokens = pre.values.sum
    val atRiskTokens = uncorroborated.map { case (w, _) => pre(w) }.sum
    println(f"vocab=$vocabSize transformed=${transformed.size} " +
      f"(${transformed.size * 100.0 / vocabSize}%.1f%%) " +
      f"uncorroborated=${uncorroborated.size} " +
      f"(${uncorroborated.size * 100.0 / vocabSize}%.2f%% of vocab)")
    println(f"token-weighted at-risk rate: $atRiskTokens/$totalTokens = " +
      f"${atRiskTokens * 100.0 / totalTokens}%.3f%% of corpus tokens")
    println("top uncorroborated detachments (word→lemma, corpus freq):")
    uncorroborated.take(40).foreach { case (w, l) =>
      println(f"  $w%-20s → $l%-18s ${pre(w)}%d") }

    // top-20 dictionary diff vs the notebook's printed cells 50/53/54
    val f = graft.features.RddPipeline.featurize(spark, Csv.TrainCsv,
      dim = 10000)
    def top20(df: org.apache.spark.sql.DataFrame): Set[String] =
      graft.features.Vocabulary.topK(df, "tokens", 20)
        .select("word").collect().map(_.getString(0)).toSet
    val refs = Map(
      "all" -> (top20(f.tokenized), Set("fire", "like", "get", "news",
        "people", "time", "year", "video", "disaster", "emergency",
        "body", "day", "home", "police", "building", "u", "family",
        "go", "life", "say")),
      "disaster" -> (top20(f.tokenized.filter(col("label") === "1")),
        Set("fire", "news", "disaster", "california", "year", "suicide",
          "police", "people", "family", "home", "train", "storm",
          "killed", "building", "like", "hiroshima", "bomb", "crash",
          "pm", "flood")),
      "non" -> (top20(f.tokenized.filter(col("label") === "0")),
        Set("like", "get", "body", "time", "day", "video", "love",
          "people", "go", "got", "know", "fire", "let", "back", "full",
          "see", "bag", "emergency", "want", "u")))
    refs.foreach { case (name, (ours, ref)) =>
      println(s"[$name] overlap=${(ours & ref).size}/20 " +
        s"missing=${(ref -- ours).toSeq.sorted.mkString(",")} " +
        s"extra=${(ours -- ref).toSeq.sorted.mkString(",")}")
    }
    spark.stop()
  }
}
