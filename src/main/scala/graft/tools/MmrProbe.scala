package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.operators.Similarity

/** Stage-isolation probe for e21's MMR cost: candidate scan vs
  * packed collect vs greedy rounds, plus optimized-plan size per
  * selK. This is the tool that caught the round-9 inline blowup
  * (plan size 2.5×/round, 0.25 s → 5.5 s from selK=1→5 with the
  * per-round withColumn formulation; see SCALE.md round 9 and
  * expressions/Bind). Usage: runMain graft.tools.MmrProbe <sfDir>
  */
object MmrProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-mmr-probe", "8")
    val d = args.head
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val emb = Tables.embeddings(spark, d)
    val qs = emb.filter(col("vec_id") < 4)
    time("warmup")(emb.count())
    val cands = Similarity.bruteForceKnn(emb, qs, 12)
    time("cands")(cands.count())
    time("cands2")(cands.count())
    val vecs = emb.select(col("vec_id").as("n_id"),
      col("embedding").as("v"), Similarity.norm(col("embedding")).as("nrm"))
    val packed = cands.join(vecs, "n_id")
      .groupBy("q_id")
      .agg(collect_list(struct(col("n_id").as("id"),
        col("cos").as("rel"), col("v"), col("nrm"))).as("cs"))
    time("packed")(packed.count())
    time("packed2")(packed.count())
    val full = Similarity.mmrRerank(emb, qs, 12, 5, 0.7)
    time("full")(full.count())
    time("full2")(full.count())
    val full1 = Similarity.mmrRerank(emb, qs, 12, 1, 0.7)
    time("selK=1")(full1.count())
    val full2 = Similarity.mmrRerank(emb, qs, 12, 2, 0.7)
    time("selK=2")(full2.count())
    val full3 = Similarity.mmrRerank(emb, qs, 12, 3, 0.7)
    time("selK=3")(full3.count())
    for (k <- Seq(1, 2, 3, 4, 5)) {
      val p = Similarity.mmrRerank(emb, qs, 12, k, 0.7)
        .queryExecution.optimizedPlan.toString
      println(s"PLAN selK=$k len=${p.length} " +
        s"exists=${"exists\\(".r.findAllIn(p).length} " +
        s"dotf64=${"dotf64|DotF64".r.findAllIn(p).length}")
    }
    spark.stop()
  }
}
