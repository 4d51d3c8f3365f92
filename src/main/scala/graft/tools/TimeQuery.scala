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
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
