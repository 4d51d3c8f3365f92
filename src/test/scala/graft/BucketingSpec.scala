package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Bucketing = pre-shuffling once at write time: two tables bucketed
  * (and sorted) by their join key into the same bucket count join
  * with NO Exchange on either side — the co-located-join strategy a
  * 100 TB fact⋈fact join relies on when neither side broadcasts.
  * Asserts both the plan shape (no shuffle; no sort either, since
  * [[Layout.writeBucketed]] lays out one file per bucket) and result
  * parity with the plain join, on the exact frame the registered
  * bk01 query builds.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("bucketed co-located join: no Exchange, no Sort, same result") {
    val base = java.nio.file.Files
      .createTempDirectory("buckets").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))

    Layout.writeBucketed(li, "li_b", s"$base/li", 8, "l_orderkey")
    Layout.writeBucketed(ord, "ord_b", s"$base/ord", 8, "o_orderkey")

    // one file per bucket: the pre-write repartition hashes with the
    // same murmur3 as the bucket spec, so sorted-bucket reads can
    // skip the sort too
    Seq(s"$base/li", s"$base/ord").foreach { p =>
      val parts = new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 8, s"$p: ${parts.length} files")
    }

    // the merge hint pins SMJ regardless of broadcast thresholds —
    // same discipline as the registered query
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")
    // modern Spark ignores write-time sort order by default (it can't
    // trust it with >1 file per bucket) and re-sorts WITHIN buckets —
    // cheap, spill-free, and shuffle-free. Our one-file-per-bucket
    // layout makes the order trustworthy, which the legacy sorted-scan
    // conf exploits: the Sort disappears too.
    spark.conf.set(
      "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val sortedPlan = spark.table("li_b").hint("merge")
        .join(spark.table("ord_b").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(sortedPlan.contains("SortMergeJoin") &&
        !sortedPlan.contains("Exchange") &&
        !sortedPlan.contains("Sort "),
        s"sorted-bucket read still sorts/shuffles:\n$sortedPlan")
    } finally spark.conf.set(
      "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")

    val expected = li.join(ord,
      col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === expected)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }

  test("registered bk02 query: per-order agg reuses bucket partitioning, one Exchange total") {
    val out = graft.queries.RelationalQueries
      .queries("bk02_bucketed_agg")(spark, sf)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the ONLY shuffle is the tiny histogram regroup on top; the
    // per-orderkey aggregate runs on bucket-aligned partitions
    val exchanges = "Exchange".r.findAllMatchIn(plan).length
    assert(exchanges == 1, s"expected 1 Exchange, got $exchanges:\n$plan")

    val got = out.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("li_raw2")
    val exp = spark.sql(
      """SELECT n_items, count(*) AS n_orders FROM (
           SELECT l_orderkey, count(*) AS n_items
           FROM li_raw2 GROUP BY l_orderkey)
         GROUP BY n_items""").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp && got.nonEmpty)
    spark.sql("DROP TABLE IF EXISTS graft_bk2_li")
  }

  test("registered bk01 query: join subplan is exchange-free, result matches plain SQL") {
    val out = graft.queries.RelationalQueries
      .queries("bk01_bucketed_join")(spark, sf)
    // the agg on top shuffles (tiny, by priority); the join beneath
    // must not — assert on the co-located join frame itself
    val joined = spark.table("graft_bk_li").hint("merge")
      .join(spark.table("graft_bk_ord").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
      plan)

    val got = out.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("li_raw")
    spark.read.parquet(s"$sf/orders.parquet")
      .createOrReplaceTempView("ord_raw")
    val exp = spark.sql(
      """SELECT o_orderpriority, count(*) AS n_items,
         round(sum(l_quantity), 2) AS sum_qty
         FROM li_raw JOIN ord_raw ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority""").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == exp && got.nonEmpty)
    spark.sql("DROP TABLE IF EXISTS graft_bk_li")
    spark.sql("DROP TABLE IF EXISTS graft_bk_ord")
  }
}
