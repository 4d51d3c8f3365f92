package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Round-15 audit of AQE partition coalescing on the tiny-stage tail
  * (VERDICT r14 #3: q25/q10/q02/e11/d11 run 2-5x faster at 8 cores
  * than 32 in the driver's bench — pure shuffle-width fixed cost).
  * Runs each query twice on isolated sessions — default conf vs
  * `coalescePartitions.parallelismFirst=false` — and prints the
  * post-AQE executed plan (AQEShuffleRead nodes show the runtime
  * partition counts) plus wall time.
  *
  * Usage: runMain graft.tools.AqeAudit [names...]
  */
object AqeAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-aqe-audit",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    graft.core.Tables.lineitem(spark, sfDir).count() // warmup
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q25_conversion_funnel", "q10_conditional_agg",
        "q02_filter_project", "e11_pq_adc_topk", "d11_containment_pairs")
    for (n <- names; pf <- Seq("true", "false")) {
      val iso = spark.newSession()
      iso.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      System.gc()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(iso, sfDir)
      df.queryExecution.toRdd.foreach(_ => ())
      val dt = (System.nanoTime() - t0) / 1e9
      // second run, warm
      System.gc()
      val t1 = System.nanoTime()
      val df2 = SparkEntry.queries(n)(iso, sfDir)
      df2.queryExecution.toRdd.foreach(_ => ())
      val dt2 = (System.nanoTime() - t1) / 1e9
      println(f"[aqe-audit] $n parallelismFirst=$pf cold=$dt%.2f " +
        f"warm=$dt2%.2f s")
      val plan = df2.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      println(plan.linesIterator
        .filter(l => l.contains("AQEShuffleRead") ||
          l.contains("Exchange") || l.contains("coalesced"))
        .mkString("\n"))
      spark.sparkContext.getPersistentRDDs.foreach {
        case (_, rdd) => rdd.unpersist(blocking = true)
      }
    }
    spark.stop()
  }
}
