package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-shuffling once at write time: two tables bucketed
  * (and sorted) by their join key into the same bucket count join
  * with NO Exchange on either side — the co-located-join strategy a
  * 100 TB fact⋈fact join relies on when neither side broadcasts.
  * Asserts both the plan shape (no shuffle) and result parity with
  * the plain join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("bucketed co-located join: no Exchange, same result") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val base = java.nio.file.Files
        .createTempDirectory("buckets").toString
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))

      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/li_b").saveAsTable("li_b")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/ord_b").saveAsTable("ord_b")

      val joined = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      val expected = li.join(ord,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
