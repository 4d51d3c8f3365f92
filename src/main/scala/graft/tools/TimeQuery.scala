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
      val t0 = System.nanoTime()
      // Materialize every output column executor-side, same as Bench —
      // count() lets the optimizer prune projections, timing the scan
      // instead of the work.
      SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.foreach {
        case (_, rdd) => rdd.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
