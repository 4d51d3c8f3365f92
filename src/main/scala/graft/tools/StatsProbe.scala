package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.operators.Layout

/** Exact vs approx table-stats head-to-head (ly04's scale story):
  * multi-column exact countDistinct plans an Expand (rows × columns),
  * the HLL form folds one sketch per column with none.
  * Usage: runMain graft.tools.StatsProbe <sfDir>
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-stats-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val orders = Tables.orders(spark, d)
    val numeric = Seq(
      "o_orderkey" -> col("o_orderkey"),
      "o_custkey" -> col("o_custkey"),
      "o_totalprice" -> col("o_totalprice"),
      "o_orderdate" -> unix_millis(col("o_orderdate").cast("timestamp")))
    val strings = Seq("o_orderstatus", "o_orderpriority")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    orders.count() // warm FS cache
    (1 to 2).foreach(i => time(s"exact#$i")(
      Layout.tableStats(orders, numeric, strings).collect()))
    (1 to 2).foreach(i => time(s"approx#$i")(
      Layout.tableStatsApprox(orders, numeric, strings).collect()))
    spark.stop()
  }
}
