package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.{Analysis, TextOps}

/** Stage-level timing for t20's bigram LM: fit vs score vs gram build
  * (round-9 probe; kept as a measurement tool, not part of the gate).
  */
object BigramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.core.Sessions.local("graft-bigram-probe", "32")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    timed("count-docs")(docs.count())
    val toks = docs
      .select(col("doc_id"), TextOps.tokenize(col("text")).as("__toks"))
    timed("tokenize-only") {
      toks.select(sum(size(col("__toks")))).head
    }
    val grams = toks
      .select(col("doc_id"), Analysis.ngrams(col("__toks"), 2).as("grams"))
      .filter(size(col("grams")) > 0)
    timed("gram-build") {
      grams.select(sum(size(col("grams")))).head
    }
    val counts = grams.select(explode(col("grams")).as("g"))
      .groupBy(col("g")).count()
    timed("gram-agg")(counts.count())
    timed("total-agg")(counts.agg(sum(col("count"))).head)
    val ctx = counts
      .groupBy(substring_index(col("g"), " ", 1).as("w1"))
      .agg(sum(col("count")).as("ccnt"))
    timed("model-join-collect") {
      counts.orderBy(col("count").desc, col("g").asc).limit(30)
        .join(ctx, substring_index(col("g"), " ", 1) === col("w1"))
        .select(col("g"), col("count"), col("ccnt")).collect()
    }
    val model = (0 until 30).map(i => s"w$i x$i" -> -1.0).toMap
    timed("score-only") {
      grams.select(col("doc_id"), size(col("grams")).as("n"),
        Analysis.unigramAvgLogProb(col("grams"), model, -9.0).as("lp"))
        .select(sum(col("lp"))).head
    }
    spark.stop()
  }
}
