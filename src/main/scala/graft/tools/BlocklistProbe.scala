package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.text.TextOps
import graft.queries.TextQueries

/** Interleaved A/B: Aho–Corasick BlocklistHits kernel vs the composed
  * per-pattern contains chain, t21's exact shape.
  */
object BlocklistProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-bl-probe", "32")
    val d = args.head
    val docs = Tables.documents(spark, d)
    docs.count()
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.foreach(_ => ())
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 3).foreach { i =>
      time(s"composed#$i")(docs.select(col("doc_id"),
        TextOps.blocklistHitsComposed(col("text"), TextQueries.Blocklist)
          .as("n_hits")).withColumn("blocked", col("n_hits") > 0))
      time(s"kernel#$i")(docs.select(col("doc_id"),
        TextOps.blocklistHits(col("text"), TextQueries.Blocklist)
          .as("n_hits")).withColumn("blocked", col("n_hits") > 0))
    }
    // realistic blocklist size: 400 two-token phrases
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "merge", "batch", "spark",
      "line", "sort", "window", "order", "data", "column", "join")
    val rng = new scala.util.Random(7L)
    val big = Seq.fill(400)(
      s"${vocab(rng.nextInt(20))} ${vocab(rng.nextInt(20))}").distinct
    println(s"big blocklist: ${big.length} entries")
    (1 to 3).foreach { i =>
      time(s"composed400#$i")(docs.select(col("doc_id"),
        TextOps.blocklistHitsComposed(col("text"), big).as("n_hits")))
      time(s"kernel400#$i")(docs.select(col("doc_id"),
        TextOps.blocklistHits(col("text"), big).as("n_hits")))
    }
    // production blocklist scale: ~100k generated 3-token phrases
    // (the C4 bad-words list is ~2k; contamination phrase screens
    // reach 1e5). The composed form at this size would run 100k
    // contains() scans per doc — hours — so only the kernel is timed;
    // the list-size-INDEPENDENCE claim is kernel vs kernel400 vs the
    // 263-entry production list above. Automaton footprint printed
    // alongside (flat primitive arrays, O(pattern bytes)).
    val bigVocab = graft.queries.TextQueries.blocklist100k
    println(s"100k blocklist: ${bigVocab.length} entries")
    val auto = new graft.expressions.AcAutomaton(bigVocab.toArray)
    val (states, edges) = auto.sizeStats
    val patBytes = bigVocab.map(_.getBytes("UTF-8").length).sum
    println(s"automaton: states=$states edges=$edges patternBytes=$patBytes")
    (1 to 3).foreach { i =>
      time(s"kernel100k#$i")(docs.select(col("doc_id"),
        TextOps.blocklistHits(col("text"), bigVocab).as("n_hits")))
    }
    spark.stop()
  }
}
