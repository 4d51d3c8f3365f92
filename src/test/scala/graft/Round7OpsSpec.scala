package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}
import graft.queries.TemporalQueries

/** Unit contracts for the round-7 operators: the persisted IVF index
  * (build-once / query-many; e16) and the cohort-retention matrix
  * (q26). The DuckDB oracles prove engine parity on the corpus; these
  * prove the hand-computable semantics, the indexed≡in-flight
  * identity, and the partition-pruning plan shape.
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ivfSearchIndexed ≡ ivfSearch on the same corpus + centroids") {
    val ctrs = Similarity.randomPlanes(8, 64, seed = 7L)
    val queries = emb.filter(col("vec_id") < 10)
    val inFlight = Similarity.ivfSearch(emb, queries, ctrs,
      k = 10, nProbe = 4).collect().map(_.toSeq).toSet
    val path = java.nio.file.Files
      .createTempDirectory("ivf-spec-").toString
    Similarity.ivfWriteIndex(emb, ctrs, path)
    val indexed = Similarity.ivfSearchIndexed(spark, path, queries,
      ctrs, k = 10, nProbe = 4).collect().map(_.toSeq).toSet
    assert(indexed == inFlight)
    assert(indexed.nonEmpty)
  }

  test("indexed probe prunes to the probed cells' partitions") {
    val ctrs = Similarity.randomPlanes(8, 64, seed = 7L)
    val path = java.nio.file.Files
      .createTempDirectory("ivf-spec-prune-").toString
    Similarity.ivfWriteIndex(emb, ctrs, path)
    // nProbe=1, one query → exactly one probed cell.
    val one = Similarity.ivfSearchIndexed(spark, path,
      emb.filter(col("vec_id") === 0), ctrs, k = 5, nProbe = 1)
    val scans = one.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    // the index scan must carry the cell predicate as a
    // PartitionFilter — a data filter would mean every cell
    // directory is read and filtered row-wise (with one probed cell
    // Catalyst folds the IN to an equality, so match either form)
    assert("PartitionFilters: \\[[^\\]]*cell".r
      .findFirstIn(scans).isDefined,
      s"no cell partition filter in index scan:\n$scans")
    val pushedSection = scans.split("PushedFilters").last
    assert(!pushedSection.takeWhile(_ != ']').contains("cell"),
      s"cell leaked into data filters:\n$scans")
    assert(one.count() === 5)
  }

  test("incrementalNearDups ≡ minhashLshPairsFast restricted to batch×index") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.shingles(docs, "doc_id",
      graft.text.TextOps.tokenize(col("text")))
    val full = Dedup.minhashLshPairsFast(sh, threshold = 0.5)
      .filter(col("a") < 100 && col("b") >= 100)
      .collect().map(_.toSeq).toSet
    val path = java.nio.file.Files
      .createTempDirectory("lsh-idx-spec-").toString
    Dedup.writeNearDupIndex(sh.filter(col("doc_id") >= 100), path)
    val inc = Dedup.incrementalNearDups(spark, path,
      sh.filter(col("doc_id") < 100), threshold = 0.5)
      .collect().map(_.toSeq).toSet
    assert(inc == full)
    assert(inc.nonEmpty,
      "fixture must contain at least one batch×index near-dup pair")
  }

  test("cohortRetention: hand-computed matrix on a planted fixture") {
    import spark.implicits._
    val DayMs = 86400000L
    // user 1 active days 0,1,3; user 2 days 1,3; user 3 day 3 only.
    val events = Seq(
      (1L, 0L * DayMs + 5), (1L, 1L * DayMs + 9), (1L, 3L * DayMs),
      (1L, 3L * DayMs + 77),                     // same day, no double count
      (2L, 1L * DayMs + 1), (2L, 3L * DayMs + 2),
      (3L, 3L * DayMs + 3)
    ).toDF("user_id", "t")
    val got = TemporalQueries.cohortRetention(events)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),  // cohort day-0 = user 1
      (1L, 0L, 1L), (1L, 2L, 1L),                // cohort day-1 = user 2
      (3L, 0L, 1L)))                             // cohort day-3 = user 3
  }
}
