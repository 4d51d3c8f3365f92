package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned-layout discipline: a corpus written with
  * `partitionBy(lang)` must answer a lang-filtered query by scanning
  * only that partition's directory — the plan carries the predicate
  * as a PartitionFilter (not a data filter), which is what keeps a
  * 100 TB scan from touching 100 TB.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("partitionBy(lang) write → lang predicate becomes a PartitionFilter") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val base = java.nio.file.Files
      .createTempDirectory("parts").toString + "/docs"
    docs.write.partitionBy("lang").parquet(base)

    val langs = docs.select("lang").distinct()
      .collect().map(_.getString(0))
    val target = langs.head

    val q = spark.read.parquet(base).filter(col("lang") === target)
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("\\s", "").contains(s"isnotnull(lang"),
      s"no partition filter in scan:\n$scan")
    // data-filter list must NOT carry the lang predicate (it would
    // mean the scan reads every partition and filters rows)
    val pushedSection = scan.split("PushedFilters").last
    assert(!pushedSection.contains("lang"),
      s"lang leaked into data filters:\n$scan")

    val expected = docs.filter(col("lang") === target).count()
    assert(q.count() === expected)
  }

  test("registered ly01 query: lang predicate prunes partitions, result matches plain SQL") {
    val out = graft.queries.RelationalQueries
      .queries("ly01_partition_pruned_scan")(spark, "/root/testdata/sf0.001")
    val scan = out.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("\\s", "").contains("(lang"),
      s"no partition filter in ly01 scan:\n$scan")
    assert(!scan.split("PushedFilters").last.contains("lang"),
      s"lang leaked into ly01 data filters:\n$scan")

    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exp = docs.filter(col("lang") === "de")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .collect().map(_.toSeq).toSet
    assert(out.collect().map(_.toSeq).toSet == exp && exp.nonEmpty)
  }
}
