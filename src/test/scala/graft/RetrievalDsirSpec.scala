package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dsir, Retrieval, Similarity}

/** Behavior the r01/r02/sp08 oracle rows cannot see: RRF's fusion
  * arithmetic against hand-computed values, rerank recall against
  * the exact scan, and the DSIR properties (target affinity of the
  * importance weights, partitioning invariance, and the Gumbel
  * resampler that is deliberately NOT oracle-compared — chained-ln
  * keys drift across libms — sampling ∝ weight).
  */
class RetrievalDsirSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rrfFuse matches hand-computed reciprocal-rank sums") {
    import spark.implicits._
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rn")
    val b = Seq((12L, 1), (10L, 2), (13L, 3)).toDF("id", "rn")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 4, k0 = 60)
      .as[(Long, Double, Int)].collect()
    def r(n: Int) = 1.0 / (60 + n)
    // 12: 1/63 + 1/61 beats 10: 1/61 + 1/62 (rank-1 anywhere wins)
    val expect = Seq(
      (12L, r(3) + r(1), 2), (10L, r(1) + r(2), 2),
      (11L, r(2), 1), (13L, r(3), 1))
      .sortBy { case (id, s, _) => (-s, id) }
    assert(got.toSeq === expect)
  }

  test("rrfFuse breaks score ties by ascending id") {
    import spark.implicits._
    val a = Seq((5L, 1), (3L, 2)).toDF("id", "rn")
    val b = Seq((3L, 1), (5L, 2)).toDF("id", "rn")
    // both ids score 1/61 + 1/62 — id 3 must precede id 5
    val got = Retrieval.rrfFuse(Seq(a, b), k = 2).as[(Long, Double, Int)]
      .collect().map(_._1).toSeq
    assert(got === Seq(3L, 5L))
  }

  private def sfDir = "/root/testdata/sf0.001"

  test("rerankCosine over the Hamming shortlist ranks by exact cosine " +
    "and recovers most of the brute-force top-k") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val qs = emb.filter(col("vec_id") < 5)
    val shortlist = Similarity.hammingTopK(emb, qs, k = 50)
      .select(col("q_id"), col("n_id"))
    val rr = Retrieval.rerankCosine(emb, qs, shortlist, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val exact = Similarity.bruteForceKnn(emb, qs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // per-query ranks are 1..10 with no duplicates
    rr.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to 10))
    }
    val hit = rr.map(r => (r._1, r._2)).count(exact.contains)
    // 1-bit sketches at dim 64: the 50-deep shortlist should catch
    // most true neighbors; well below 1.0 is expected, 0 would mean
    // the pipeline is broken
    assert(hit >= 25, s"rerank recovered only $hit/50 exact top-10 pairs")
  }

  test("DSIR weights favor target-like documents; selection is " +
    "partitioning-invariant") {
    import spark.implicits._
    // two vocabularies: target docs speak A, off-target speak B;
    // mixed docs sit in between
    val rng = new scala.util.Random(7L)
    def doc(words: Seq[String], n: Int) =
      Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" ")
    val vocabA = (0 until 20).map(i => s"alpha$i")
    val vocabB = (0 until 20).map(i => s"beta$i")
    val rows =
      (0 until 40).map(i => (i.toLong, doc(vocabA, 30), i < 20)) ++ // target
      (40 until 80).map(i => (i.toLong, doc(vocabB, 30), false)) ++
      (80 until 90).map(i =>
        (i.toLong, doc(vocabA ++ vocabB, 30), false))
    val df = rows.toDF("id", "text", "is_target")
    val toks = split(col("text"), " ")

    def run(parts: Int) = Dsir.selectTopN(df.repartition(parts), "id",
        toks, col("is_target"), m = 256, n = 90, salt = "s",
        resample = false)
      .as[(Long, Double)].collect().toSeq

    val all = run(8)
    val w = all.toMap
    val aMin = (0L until 40L).map(w).min
    val mixMax = (80L until 90L).map(w).max
    val bMax = (40L until 80L).map(w).max
    // pure target-vocabulary docs outrank mixed docs outrank
    // off-vocabulary docs — including the 20 NON-target A-speakers,
    // which is the point of the method
    assert(aMin > mixMax && mixMax > bMax,
      s"expected A > mixed > B, got aMin=$aMin mixMax=$mixMax bMax=$bMax")
    assert(run(1) === all && run(13) === all,
      "scores and order must not depend on partitioning")
  }

  test("Gumbel resampling is deterministic per salt and samples " +
    "proportionally to weight across salts") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha alpha alpha alpha", true),
      (2L, "alpha alpha alpha alpha", false),  // identical to target
      (3L, "alpha alpha beta beta", false),    // half-target
      (4L, "beta beta beta beta", false),      // off-target
      (5L, "beta gamma beta gamma", false))    // off-target
      .toDF("id", "text", "is_target")
    val toks = split(col("text"), " ")
    def pick(salt: String) = Dsir.selectTopN(df, "id", toks,
        col("is_target"), m = 64, n = 2, salt = salt)
      .as[(Long, Double, Double)].collect().map(_._1).toSet

    assert(pick("x") === pick("x"), "same salt must reproduce the draw")
    val salts = (0 until 40).map(i => s"salt$i")
    val counts = salts.flatMap(pick)
      .groupBy(identity).view.mapValues(_.size).toMap.withDefaultValue(0)
    // doc 2 (weight-max) should be drawn far more often than doc 4/5
    assert(counts(2L) > counts(4L) && counts(2L) > counts(5L),
      s"high-weight doc under-sampled: $counts")
    assert(counts(2L) >= 30, s"weight-max doc drawn only ${counts(2L)}/40")
  }

  test("featureBuckets: bigrams require 2 tokens; buckets stay in range") {
    import spark.implicits._
    val df = Seq((1L, Seq("a")), (2L, Seq("a", "b", "c")),
      (3L, Seq.empty[String])).toDF("id", "toks")
    val got = df.select(col("id"),
        Dsir.featureBuckets(col("toks"), 32).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L).size === 1)      // 1 unigram, 0 bigrams
    assert(got(2L).size === 5)      // 3 unigrams + 2 bigrams
    assert(got(3L).isEmpty)
    assert(got.values.flatten.forall(b => b >= 0 && b < 32))
  }
}
