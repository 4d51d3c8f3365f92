package graft.tools

import graft.core.Sessions

/** One-line optimized-plan size per registered query — the cheap
  * screen for the round-9 inline-blowup class of bug (a plan whose
  * optimized string dwarfs its logical complexity usually means
  * Catalyst inlined an expensive alias into consumers; see
  * expressions/Bind). Plans embedding literal model tables (BPE
  * rules, centroids, DSIR weights) are legitimately large — compare
  * against their PlanLiterals budget, not this screen.
  *
  * Usage: runMain graft.tools.PlanSizeAudit [sfDir]
  */
object PlanSizeAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-plan-size", "8")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("m0")).foreach { case (name, fn) =>
        try {
          val len = fn(spark, sfDir).queryExecution.optimizedPlan
            .toString.length
          println(f"PLANSIZE $name $len%9d")
        } catch { case e: Throwable =>
          println(s"PLANSIZE $name ERROR ${e.getClass.getSimpleName}")
        }
      }
    spark.stop()
  }
}
