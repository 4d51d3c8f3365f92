package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.operators.Dedup
import graft.text.TextOps

/** Stage-level wall-time profile of d13 (sorted-neighborhood dedup):
  * shingle-set build, rank+candidate generation, and the pair-verify
  * join. Warm numbers are the second of each pair.
  */
object SnmProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-snm-profile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime(); val a = f
      println(f"[stage] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val docs = Tables.documents(spark, d)
    val toks = TextOps.tokenize(TextOps.clean(col("text")))
    val key = substring(translate(col("text"), " ", ""), 1, 16)

    val sets = Dedup.shingleSets(docs, "doc_id", toks)
    (1 to 2).foreach(i => time(s"sets#$i")(sets.count()))
    val avgSz = sets.select(avg(size(col("shset")))).collect()(0).getDouble(0)
    println(f"[stat] avg shset size $avgSz%.1f")
    val ranked = Dedup.sortedNeighborhoodRanks(docs, "doc_id", key)
    (1 to 2).foreach(i => time(s"ranks#$i")(ranked.count()))
    val cands = Dedup.sortedNeighborhoodCands(ranked, 10)
    (1 to 2).foreach(i => time(s"cands#$i")(cands.count()))
    val setsP = sets.persist()
    time("sets-persist")(setsP.count())
    val sa = setsP.select(col("doc_id").as("a"), col("shset").as("__sa"))
    val sb = setsP.select(col("doc_id").as("b"), col("shset").as("__sb"))
    val joined = cands.join(sa, Seq("a")).join(sb, Seq("b"))
    (1 to 2).foreach(i => time(s"verify-join#$i")(
      joined.select(col("a"), col("b"),
        size(array_intersect(col("__sa"), col("__sb"))).as("i"),
        size(col("__sa")).as("na"), size(col("__sb")).as("nb"))
        .filter(col("i").cast("double") /
          (col("na") + col("nb") - col("i")) >= 0.5)
        .count()))
    (1 to 2).foreach(i => time(s"join-only#$i")(
      joined.select(col("a"), col("b"), size(col("__sa")).as("na"),
        size(col("__sb")).as("nb")).filter(col("na") + col("nb") > 0)
        .count()))
    // interleaved A/B: composed size(array_intersect) vs the
    // IntersectCountStr kernel, same joined input, 3 rounds
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    def kCount = column(graft.expressions.IntersectCountStr(
      expression(col("__sa")), expression(col("__sb"))))
    def verifyWith(ic: org.apache.spark.sql.Column) =
      joined.select(col("a"), col("b"), ic.as("i"),
        size(col("__sa")).as("na"), size(col("__sb")).as("nb"))
        .filter(col("i").cast("double") /
          (col("na") + col("nb") - col("i")) >= 0.5)
        .count()
    (1 to 3).foreach { i =>
      time(s"verify-composed#$i")(verifyWith(
        size(array_intersect(col("__sa"), col("__sb")))))
      time(s"verify-kernel#$i")(verifyWith(kCount))
    }
    (1 to 2).foreach(i => time(s"full-d13#$i")(
      Dedup.sortedNeighborhoodPairsSets(docs, "doc_id", key, toks,
        window = 10, threshold = 0.5).count()))
    spark.stop()
  }
}
