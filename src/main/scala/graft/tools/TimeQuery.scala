package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Time selected queries: `runMain graft.tools.TimeQuery <sfDir> <q>...` */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-time", "32")
    val sfDir = args.head
    graft.core.Tables.lineitem(spark, sfDir).count() // warmup
    args.tail.foreach { name =>
      // untimed inter-query hygiene, same as Bench: GC the
      // predecessor's debt before the timer starts
      System.gc()
      val t0 = System.nanoTime()
      // Materialize every output column executor-side, same as Bench —
      // count() lets the optimizer prune projections, timing the scan
      // instead of the work.
      SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // blocking: block removal must not run inside the next query's
      // timed window (see Bench.scala)
      spark.sparkContext.getPersistentRDDs.foreach {
        case (_, rdd) => rdd.unpersist(blocking = true)
      }
    }
    spark.stop()
  }
}
