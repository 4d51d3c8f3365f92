package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.operators.Quantiles

/** Interleaved same-session A/B for the exact-percentile forms in
  * q17/q23: raw-row / frequency-histogram `percentile` ("old") vs the
  * two-phase rank-select in [[graft.operators.Quantiles]] ("new").
  * `runMain graft.tools.QuantileProbe <sfDir>`, 3 rounds each.
  * Round-9 sf10 result (SCALE.md): q23 new wins 15.6 s stable vs
  * 25.8 median with a 72 s heap spike; q17 old wins 13.9 vs 51 s warm
  * floors (its frequency maps are NDV-bounded: 50 / 583k entries).
  */
object QuantileProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-qprobe", "32")
    import spark.implicits._
    val d = args.head
    def li = Tables.lineitem(spark, d).select($"l_returnflag".as("flag"),
      $"l_orderkey", $"l_quantity", $"l_extendedprice")
    li.count()

    def time(name: String)(mk: => DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.foreach(_ => ())
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.foreach {
        case (_, r) => r.unpersist(blocking = true)
      }
    }

    def sk = li.groupBy($"flag").agg(
      approx_count_distinct($"l_orderkey").as("hll"),
      percentile_approx($"l_quantity", lit(0.5), lit(10000)).as("p50"),
      percentile_approx($"l_extendedprice", lit(0.95), lit(10000))
        .as("p95"))
    def nd = li.select($"flag", $"l_orderkey").distinct()
      .groupBy($"flag").agg(count(lit(1)).as("exact_orders"))

    def oldBounds(value: Column, p: Double, lo: String,
                  hi: String): DataFrame =
      li.groupBy($"flag", value.as("v")).agg(count(lit(1)).as("w"))
        .groupBy($"flag").agg(
          percentile($"v", lit(p - 0.001), $"w").as(lo),
          percentile($"v", lit(p + 0.001), $"w").as(hi))
    def newBounds(value: String, p: Double, lo: String,
                  hi: String): DataFrame =
      Quantiles.exactPercentilesWide(li.select($"flag", col(value)),
        "flag", value, Seq((p - 0.001) -> lo, (p + 0.001) -> hi))

    def q17old = sk.join(nd, Seq("flag"))
      .join(oldBounds($"l_quantity", 0.5, "a", "b"), Seq("flag"))
      .join(oldBounds($"l_extendedprice", 0.95, "c", "e"), Seq("flag"))
    def q17new = sk.join(nd, Seq("flag"))
      .join(newBounds("l_quantity", 0.5, "a", "b"), Seq("flag"))
      .join(newBounds("l_extendedprice", 0.95, "c", "e"), Seq("flag"))
    def q23old = li.groupBy($"flag").agg(
      round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50"),
      round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90"),
      round(expr("percentile(l_extendedprice, 0.99)"), 2).as("p99"))
    def q23new = Quantiles.exactPercentilesWide(
      li.select($"flag", $"l_extendedprice"),
      "flag", "l_extendedprice",
      Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"), roundTo = 2)

    (1 to 3).foreach { r =>
      time(s"q23_old_r$r")(q23old)
      time(s"q23_new_r$r")(q23new)
      time(s"q17_old_r$r")(q17old)
      time(s"q17_new_r$r")(q17new)
    }
    spark.stop()
  }
}
