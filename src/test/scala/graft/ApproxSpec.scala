package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-aggregate error bounds: HLL++ distinct counts within its
  * configured relative error of the exact answer, approximate median
  * within the neighboring exact quantiles.
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet").cache()

  test("approx_count_distinct within 5% of exact per group") {
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.05, s"$k: $a vs $n")
    }
  }

  test("percentile_approx median sits between exact p45 and p55") {
    val bounds = li.stat
      .approxQuantile("l_quantity", Array(0.45, 0.55), 0.0)
    val approxP50 = li.agg(
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(approxP50 >= bounds(0) && approxP50 <= bounds(1),
      s"p50=$approxP50 not in [${bounds(0)}, ${bounds(1)}]")
  }
}
