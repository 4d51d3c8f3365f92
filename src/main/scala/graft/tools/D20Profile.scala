package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.operators.Dedup
import graft.text.TextOps

/** d20 (exact AllPairs prefix-filter) stage deltas + the round-10
  * suffix-capacity-filter A/B at scale.
  *
  * Stages: docSets build (persisted), candidate emission, pruning,
  * array verify — stages re-run predecessors except docSets, so read
  * deltas. The A/B derives BOTH survivor variants from the SAME
  * shared cands stage in the SAME session, interleaved (QuantileProbe
  * discipline): OLD = length + first-position filters (round 9);
  * NEW = + the alpha/last-position suffix-capacity filter. Survivor
  * ROW COUNTS are deterministic — the variance-proof half of the
  * evidence; verify times carry session noise.
  */
object D20Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-d20-profile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val t = 0.5
    val sc = spark.sparkContext
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[stage] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val docs = Tables.documents(spark, d)
    (1 to rounds).foreach { i =>
      val sh = Dedup.shingles(docs, "doc_id",
        TextOps.tokenize(col("text")))
      val st = Dedup.prefixFilterStages(sh, t)
      println(s"[rows] docSets=${time(s"docSets#$i")(st.docSets.count())}")
      println(s"[rows] cands=${time(s"cands#$i")(st.cands.count())}")
      // OLD filters (round 9): length + first-shared-position
      val oldSurv = st.cands
        .filter(lit(t) * greatest(col("na"), col("nb")) <=
          least(col("na"), col("nb")))
        .filter((lit(1.0) + lit(t)) *
          least(col("na") - col("ia"), col("nb") - col("jb")) >=
          lit(t) * (col("na") + col("nb")))
        .select(col("a"), col("b"))
      def verifyOf(surv: org.apache.spark.sql.DataFrame) = {
        val sa = st.docSets.select(col("doc_id").as("a"),
          col("shset").as("__sa"))
        val sb = st.docSets.select(col("doc_id").as("b"),
          col("shset").as("__sb"))
        surv.join(sa, Seq("a")).join(sb, Seq("b"))
          .select(col("a"), col("b"),
            Dedup.intersectCountI64(col("__sa"), col("__sb")).as("__i"),
            size(col("__sa")).as("__na"), size(col("__sb")).as("__nb"))
          .select(col("a"), col("b"),
            (col("__i").cast("double") /
              (col("__na") + col("__nb") - col("__i"))).as("jaccard"))
          .filter(col("jaccard") >= t)
      }
      println(s"[rows] survivorsOLD=" +
        time(s"survivorsOLD#$i")(oldSurv.count()))
      println(s"[rows] survivorsNEW=" +
        time(s"survivorsNEW#$i")(st.survivors.count()))
      println(s"[rows] verifyOLD=" +
        time(s"verifyOLD#$i")(verifyOf(oldSurv).count()))
      println(s"[rows] verifyNEW=" +
        time(s"verifyNEW#$i")(st.result.count()))
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
