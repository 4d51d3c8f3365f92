package graft.tools

import org.apache.spark.sql.functions._

/** Round-14 A/B: BPE merge training, bounded local finish vs forced
  * distributed rounds, post-warmup, interleaved reps.
  * Usage: runMain graft.tools.BpeAbProbe [sfDir]
  */
object BpeAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-bpe-ab", "*")
    val docs = graft.core.Tables.documents(spark, sfDir)
    val toks = graft.text.TextOps.tokenize(
      graft.text.TextOps.clean(col("text")))
    def timed(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[bpe-ab] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm both paths (codegen + page cache)
    graft.operators.Bpe.trainMerges(docs, toks, 2)
    graft.operators.Bpe.trainMerges(docs, toks, 2, localFinishVocab = 0L)
    for (rep <- 1 to 3) {
      timed(s"local 12-merge train rep$rep") {
        graft.operators.Bpe.trainMerges(docs, toks, 12) }
      timed(s"distributed 12-merge train rep$rep") {
        graft.operators.Bpe.trainMerges(docs, toks, 12,
          localFinishVocab = 0L) }
    }
    spark.stop()
  }
}
