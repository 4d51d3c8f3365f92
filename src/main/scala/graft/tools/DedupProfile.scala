package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.operators.Dedup
import graft.text.TextOps

/** Stage-level wall-time profile of the MinHash-LSH pipeline — which
  * stage dominates d03/d05 (shingling, minhash aggregation, candidate
  * self-join, or exact-Jaccard verification). Each stage is counted
  * twice; read the second (warm) number.
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-dedup-profile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[stage] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val docs = Tables.documents(spark, d)
    val sh = Dedup.shingles(docs, "doc_id", TextOps.tokenize(col("text")))
    (1 to 2).foreach(i => time(s"shingles#$i")(sh.count()))
    val bands = Dedup.lshBandSignatures(sh, 16, 4)
    val bandsFast = Dedup.lshBandSignaturesFast(sh, 16, 4)
    (1 to 2).foreach(i => time(s"bands-md5#$i")(bands.count()))
    (1 to 2).foreach(i => time(s"bands-xx#$i")(bandsFast.count()))
    val cands = Dedup.lshCandidates(bands)
    (1 to 2).foreach(i => time(s"cands-md5#$i")(cands.count()))
    (1 to 2).foreach(i =>
      time(s"verify#$i")(Dedup.verifyJaccard(sh, cands, 0.5).count()))
    (1 to 2).foreach(i => time(s"full-d03#$i")(
      Dedup.minhashLshPairs(sh).count()))
    (1 to 2).foreach(i => time(s"full-d05#$i")(
      Dedup.minhashLshPairsFast(sh).count()))
    // the exact family head-to-head: unbounded all-shared-shingle
    // emission (d02's engine, corpus-wide) vs prefix-filtered (d20) —
    // both compute the identical lossless relation
    (1 to 2).foreach(i => time(s"exact-allpairs#$i")(
      Dedup.jaccardPairs(sh, 0.5).count()))
    (1 to 2).foreach(i => time(s"exact-prefix#$i")(
      Dedup.prefixFilterPairs(sh, 0.5).count()))
    // d20 stage breakdown: docSets build, candidate emission +
    // positional/length pruning, array verify (each stage re-times
    // the ones before it — read the deltas)
    val st = Dedup.prefixFilterStages(sh, 0.5)
    (1 to 2).foreach(i => time(s"d20-docSets#$i")(st.docSets.count()))
    (1 to 2).foreach(i => time(s"d20-cands#$i")(st.cands.count()))
    (1 to 2).foreach(i =>
      time(s"d20-survivors#$i")(st.survivors.count()))
    (1 to 2).foreach(i => time(s"d20-verify#$i")(st.result.count()))
    st.docSets.unpersist(blocking = true)
    spark.stop()
  }
}
