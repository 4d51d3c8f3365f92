package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Sessions
import graft.operators.Splits

/** Measures the two-level bucketed operators against their naive
  * single-window forms on generated data — the numeric evidence
  * behind the scale-shape claims in SURVEY.md (the sf0.1 corpus is
  * far too small to show the difference; this generates millions of
  * rows with few groups, the shape that breaks per-group windows).
  *
  * Usage: runMain graft.tools.ScaleProbe [nRows] [nGroups]
  */
object ScaleProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(5000000L)
    val groups = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = Sessions.local("graft-scale-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
    import spark.implicits._

    val docs = spark.range(n)
      .select($"id",
        concat(lit("g"), pmod($"id", lit(groups.toLong))).as("g"),
        (pmod($"id" * 2654435761L, lit(97L)) + 1L).as("cost"))
      .persist()
    docs.count() // materialize off the timed path
    val budget = n / groups / 2 * 49 // ~half of each group's total

    def naiveCap(): Long = {
      val w = Window.partitionBy($"g").orderBy($"__rk", $"id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.withColumn("__rk", Splits.hash60($"id", "probe"))
        .withColumn("__cum", coalesce(sum($"cost").over(w), lit(0L)))
        .filter($"__cum" < budget).count()
    }
    def bucketedCap(): Long =
      Splits.tokenBudgetCap(docs, "id", "g", "cost", "probe", budget)
        .count()
    def naiveRank(): Long =
      docs.withColumn("__rk", Splits.hash60($"id", "probe"))
        .withColumn("pos",
          row_number().over(Window.orderBy($"__rk", $"id")).cast("long") - 1L)
        .agg(max($"pos")).head.getLong(0)
    def bucketedRank(): Long =
      Splits.shuffleRank(docs, "id", "probe")
        .agg(max($"shuffle_pos")).head.getLong(0)

    // warmup (codegen) on a slice, untimed
    Splits.tokenBudgetCap(docs.limit(1000), "id", "g", "cost", "p2", 10)
      .count()

    val (cN, tN) = time(naiveCap())
    val (cB, tB) = time(bucketedCap())
    require(cN == cB, s"cap divergence: naive=$cN bucketed=$cB")
    val (rN, tRN) = time(naiveRank())
    val (rB, tRB) = time(bucketedRank())
    require(rN == rB && rN == n - 1, s"rank divergence: $rN vs $rB")
    println(f"[probe] n=$n groups=$groups kept=$cB")
    println(f"[probe] tokenBudgetCap naive-window=$tN%.1fs bucketed=$tB%.1fs")
    println(f"[probe] shuffleRank   naive-window=$tRN%.1fs bucketed=$tRB%.1fs")
    spark.stop()
  }
}
