package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Verifies the layout operators by what they exist for: the per-file
  * min/max statistics a scan would prune on, and the file-count/row
  * bounds of compaction.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String =
    java.nio.file.Files.createTempDirectory("layout").toString

  test("zValue interleaves bits (hand-computed cases)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (7L, 7L))
      .toDF("a", "b")
      .select(Layout.zValue($"a", $"b")).as[Long].collect().toSeq
    // (3,5): a=011 on even bits -> 010101 & a-bits=1,1,0 -> 0b000111?
    // interleave b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 0b100111 = 39
    assert(got == Seq(0L, 1L, 2L, 39L, 63L))
  }

  test("zOrderWrite: every file bounds BOTH dimensions; sort bounds one") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))

    val zDir = tmp(); val sDir = tmp()
    Layout.zOrderWrite(li, "l_orderkey", "l_partkey", zDir, numFiles = 8)
    // baseline: same file count, range-clustered by orderkey only
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sDir)

    // per-file relative width of each dimension = what min/max pruning
    // sees. Mean over files, as a fraction of the global range.
    def spreads(dir: String): (Double, Double) = {
      val df = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
      val g = df.groupBy("f").agg(
        (max("l_orderkey") - min("l_orderkey")).as("ow"),
        (max("l_partkey") - min("l_partkey")).as("pw"))
      val (gOw, gPw) = {
        val r = df.agg(max("l_orderkey") - min("l_orderkey"),
          max("l_partkey") - min("l_partkey")).head
        (r.getLong(0).toDouble, r.getLong(1).toDouble)
      }
      val m = g.agg(avg("ow"), avg("pw")).head
      (m.getDouble(0) / gOw, m.getDouble(1) / gPw)
    }

    val (zOw, zPw) = spreads(zDir)
    val (sOw, sPw) = spreads(sDir)
    // single-column sort: near-perfect on orderkey, useless on partkey
    assert(sOw < 0.2, s"sorted orderkey spread $sOw")
    assert(sPw > 0.8, s"sorted layout should NOT bound partkey: $sPw")
    // z-order: BOTH dimensions materially bounded per file
    assert(zOw < 0.6, s"z-order orderkey spread $zOw")
    assert(zPw < 0.6, s"z-order partkey spread $zPw")

    // layout must not change the data
    val a = spark.read.parquet(zDir)
      .agg(count(lit(1)), round(sum("l_quantity"), 2)).head
    val b = li.agg(count(lit(1)), round(sum("l_quantity"), 2)).head
    assert(a == b)
  }

  test("compact: target file count, per-file row cap, identical data") {
    import spark.implicits._
    val small = tmp(); val out = tmp()
    // 64 tiny files
    spark.range(0, 10000).toDF("id").repartition(64)
      .write.mode("overwrite").parquet(small)
    assert(new java.io.File(small).listFiles()
      .count(_.getName.endsWith(".parquet")) == 64)

    Layout.compact(spark, small, out, targetRows = 2500L)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f")).count()
      .select("count").as[Long].collect().toSeq
    // ~4 target files; round-robin repartition can put a handful of
    // rows over the cap in a partition, which maxRecordsPerFile then
    // splits off — a stray sliver file is the cap working, not a bug
    assert(perFile.size >= 4 && perFile.size <= 6,
      s"expected ~4 files, got ${perFile.size}: $perFile")
    assert(perFile.forall(_ <= 2500L))
    assert(perFile.sum == 10000L)
    // content identical
    val ids = spark.read.parquet(out).select("id").as[Long].collect()
    assert(ids.sorted.toSeq == (0L until 10000L))
  }

  test("ly02: rectangle predicate is pushed to the z-clustered scan; " +
      "result is layout-invariant") {
    val sf = "/root/testdata/sf0.001"
    val got = queries.RelationalQueries.queries("ly02_zorder_scan")(spark, sf)
    // both dimension bounds must reach the parquet reader as data
    // filters — that is what row-group min/max skipping prunes on
    // (read from scan metadata: the plan's toString truncates the list)
    // unwrap AQE: AdaptiveSparkPlanExec is itself a leaf wrapper
    val inner = got.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = inner.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString("\n")
    for (c <- Seq("o_custkey", "o_totalprice");
         op <- Seq("GreaterThanOrEqual", "LessThanOrEqual"))
      assert(scan.contains(s"$op($c,"), s"missing pushed $op on $c:\n$scan")
    // layout must not change the logical result
    val raw = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_custkey").between(100, 500) &&
        col("o_totalprice").between(50000, 200000))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
    assert(got.orderBy("o_orderpriority").collect().toSeq ==
      raw.orderBy("o_orderpriority").collect().toSeq)
  }

  test("ly03: compacted documents rollup equals the raw rollup") {
    val sf = "/root/testdata/sf0.001"
    val got = queries.RelationalQueries.queries("ly03_compacted_scan")(spark, sf)
    val raw = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    assert(got.orderBy("lang").collect().toSeq ==
      raw.orderBy("lang").collect().toSeq)
  }

  test("ly04 tableStats: planted nulls, dupes, min/max; no Expand") {
    import spark.implicits._
    val df = Seq(
      (Some(5L), Some("b")), (Some(5L), None),
      (Some(2L), Some("a")), (None, Some("a")))
      .toDF("x", "s")
    val stats = graft.operators.Layout.tableStats(df,
        numericCols = Seq("x" -> col("x")), stringCols = Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = stats("x")
    assert(x.getLong(1) == 4 && x.getLong(2) == 1 && // rows, nulls
      x.getLong(3) == 2 &&                           // ndv (non-null)
      x.getDouble(4) == 2.0 && x.getDouble(5) == 5.0)
    val sCol = stats("s")
    assert(sCol.getLong(2) == 1 && sCol.getLong(3) == 2 &&
      sCol.getString(6) == "a" && sCol.getString(7) == "b")
    // union-of-narrow-branches contract: one single-distinct branch
    // per column (two-phase distinct rewrite), NEVER the rows×columns
    // Expand the old single-agg form planned (3× slower at sf10 —
    // SCALE.md round 14 (d))
    val plan = graft.operators.Layout.tableStats(df,
        Seq("x" -> col("x")), Seq("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"tableStats regressed to the Expand plan:\n$plan")
    assert(plan.contains("Union"),
      s"tableStats lost its per-column branches:\n$plan")
  }

  test("tableStatsApprox: no Expand pass; estimates band-true vs exact") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.01/orders.parquet")
    val numeric = Seq(
      "o_orderkey" -> col("o_orderkey"),
      "o_custkey" -> col("o_custkey"),
      "o_totalprice" -> col("o_totalprice"))
    val strings = Seq("o_orderstatus", "o_orderpriority")
    val approx = graft.operators.Layout
      .tableStatsApprox(orders, numeric, strings)
    // the sketch form folds every column in ONE aggregation over ONE
    // scan: no Expand AND no per-column union branches
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      s"approx stats must not Expand:\n$approxPlan")
    assert(!approxPlan.contains("Union"),
      s"approx stats must stay a single scan:\n$approxPlan")
    // HLL estimates within 5% of exact per column
    val ex = graft.operators.Layout.tableStats(orders, numeric, strings)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    graft.operators.Layout.tableStatsApprox(orders, numeric, strings)
      .collect().foreach { r =>
        val (c, est) = (r.getString(0), r.getLong(3))
        assert(math.abs(est - ex(c)) <= math.max(1L, ex(c) / 20),
          s"$c: est $est vs exact ${ex(c)}")
      }
  }
}
