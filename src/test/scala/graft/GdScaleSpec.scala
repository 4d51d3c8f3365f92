package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gd._

/** Gradient descent at vocabulary scale (SURVEY.md §7 #5): dim = 10⁶.
  *
  * At this width a dense per-partition gradient is 8 MB; the adaptive
  * pack in [[GradientDescent.GradVec]] ships sorted-sparse blocks
  * instead when a partition touches few coordinates. This spec pins
  * (1) exactness — a hand-computed first GD step at dim = 10⁶ with
  * coordinates at both extremes of the index range; (2) partitioning
  * invariance — the same corpus trained over 2 vs 13 partitions
  * (sparse merges vs denser fan-in) converges to the same curve; and
  * (3) wall-time sanity for 5 full-batch iterations over 2 000 docs
  * (recorded; the 100 TB argument is the shipped-bytes math, the
  * bound here only catches pathological regressions).
  */
class GdScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val Dim = 1000000

  test("first GD step at dim=1e6 matches the closed form") {
    import spark.implicits._
    // coef = 0 ⇒ θ = 0, σ = 1/2 ⇒ per-doc grad = x·(1/2 − y),
    // cost = ln 2 per doc; SGD: coef −= lr·grad.
    val docs = Seq(
      SparseDoc("a", 1.0, Array(0, 999999), Array(2.0, 4.0)),
      SparseDoc("b", 0.0, Array(500000, 999999), Array(6.0, 8.0)))
    val res = GradientDescent.run(spark.createDataset(docs).repartition(2),
      Dim, LogisticLoss,
      GradientDescent.Config(iterations = 1, learningRate = 0.1,
        boldDriver = false))
    assert(math.abs(res.costs(0) - 2 * math.log(2)) < 1e-12)
    val c = res.coef
    assert(math.abs(c(0) - 0.1 * 2.0 * 0.5) < 1e-12)      // −lr·2·(−½)
    assert(math.abs(c(500000) - (-0.1 * 6.0 * 0.5)) < 1e-12)
    assert(math.abs(c(999999) - 0.1 * (4.0 * 0.5 - 8.0 * 0.5)) < 1e-12)
    assert(c.count(_ != 0.0) == 3)
  }

  test("dim=1e6 training is partitioning-invariant and tree merges stay sparse") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0 until 2000).map { i =>
      val nnz = 10 + rnd.nextInt(20)
      val idx = Array.fill(nnz * 2)(rnd.nextInt(Dim))
        .distinct.sorted.take(nnz)
      SparseDoc(i.toString, (i % 2).toDouble, idx,
        Array.fill(idx.length)(rnd.nextDouble()))
    }
    val cfg = GradientDescent.Config(iterations = 5, learningRate = 0.05,
      reg = GradientDescent.L2(0.1))

    val t0 = System.nanoTime()
    val few = GradientDescent.run(
      spark.createDataset(docs).repartition(2), Dim, LogisticLoss, cfg)
    val t1 = System.nanoTime()
    // 13 partitions ≤ 16 still aggregates at depth 1 but exercises a
    // wider sparse fan-in (and empty-partition handling via the odd
    // count); a cluster run at >16 partitions only adds a tree level.
    val many = GradientDescent.run(
      spark.createDataset(docs).repartition(13), Dim, LogisticLoss, cfg)

    // fp addition order differs across partitionings; curves agree to
    // rtol — the merge is index-wise either way.
    few.costs.zip(many.costs).foreach { case (a, b) =>
      assert(math.abs(a - b) / math.abs(a) < 1e-9, s"$a vs $b")
    }
    assert(few.costs.length == 5 && few.costs.last < few.costs.head)

    // ~2k docs × ≤30 nnz ⇒ ≤60k touched slots per partition — far
    // under the 2/3·dim dense cutoff, so every shipped block is sparse
    val secs = (t1 - t0) / 1e9
    info(f"5 iterations, 2000 docs, dim=1e6, 2 partitions: $secs%.2f s")
    assert(secs < 60.0, f"dim=1e6 run took $secs%.1f s")
  }
}
