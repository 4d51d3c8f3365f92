package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** A/B for the LogLog rank kernel: register computation over the
  * documents token stream with [[Sketches.logLog]] (LZCNT kernel)
  * vs [[Sketches.logLogComposed]] (`length(bin(w))` — allocates a
  * digit string per token). Interleaved runs, registers asserted
  * identical each round.
  *
  * Usage: runMain graft.tools.LogLogProbe <sfDir> [rounds]
  */
object LogLogProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.local("graft-loglog-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
    import spark.implicits._
    val toks = graft.core.Tables.documents(spark, sfDir)
      .select(explode(graft.text.TextOps.tokenize($"text")).as("w"))
    toks.count() // FS-cache + codegen warmup, untimed
    for (i <- 1 to rounds) {
      val res = Seq(
        "kernel  " -> Sketches.logLog _,
        "composed" -> Sketches.logLogComposed _).map { case (tag, f) =>
        System.gc()
        val t0 = System.nanoTime()
        val regs = toks.select(f($"w", 6).as("l"))
          .groupBy($"l.bucket").agg(max($"l.rho").as("r"))
          .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
        println(f"[loglog-probe] $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2f s (${regs.size} buckets)")
        regs
      }
      require(res(0) == res(1), "kernel/composed register mismatch")
    }
    spark.stop()
  }
}
