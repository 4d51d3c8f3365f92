package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gd._

/** Round-15 bounded local finish for the RDD trainers
  * ([[GradientDescent.runRdd]], [[TwoLayerNet.trainRdd]]): below the
  * rows+bytes driver bound the 300 iteration-jobs run in-process over
  * a glom-collected copy that preserves partition structure, merging
  * partials in partition-index order. That order is ONE of the
  * arrival orders the distributed reduce produces nondeterministically,
  * so local and forced-distributed results must agree to the same
  * rtol the committed goldens use (1e-9 — far tighter than the gate's
  * 1e-6 bands).
  *
  * Also pins the gate itself: `localFinishRows = 0` and a 1-byte
  * `localFinishBytes` must both take the distributed path (exercised
  * by asserting those runs agree with the default-path run — and, for
  * the rows=0 case, that no extra collect of the input happens is a
  * non-goal; the contract is result parity both ways).
  */
class GdLocalParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val Dim = 300

  def docs(n: Int, seed: Int): Seq[SparseDoc] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val nnz = 3 + rnd.nextInt(12)
      val idx = Array.fill(nnz * 2)(rnd.nextInt(Dim))
        .distinct.sorted.take(nnz)
      SparseDoc(s"doc$i", (i % 2).toDouble, idx,
        Array.fill(idx.length)(rnd.nextDouble()))
    }
  }

  def relEq(a: Double, b: Double, tag: String): Unit =
    assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
      s"$tag: $a vs $b")

  def arrEq(a: Array[Double], b: Array[Double], tag: String): Unit = {
    assert(a.length == b.length, tag)
    var k = 0
    while (k < a.length) { relEq(a(k), b(k), s"$tag[$k]"); k += 1 }
  }

  test("GD local finish ≡ distributed: SGD + L2, empty partitions included") {
    import spark.implicits._
    // 7 partitions over 40 docs: uneven, and repartition keeps some
    // partitions small; the n=5/parts=7 variant below forces empties
    val ds = spark.createDataset(docs(40, 11)).repartition(7).persist()
    val cfg = GradientDescent.Config(iterations = 20,
      learningRate = 0.05, optimizer = "SGD",
      reg = GradientDescent.L2(0.7))
    val local = GradientDescent.run(ds, Dim, LogisticLoss, cfg)
    val dist = GradientDescent.run(ds, Dim, LogisticLoss, cfg,
      localFinishRows = 0L)
    arrEq(local.costs, dist.costs, "sgd costs")
    arrEq(local.coef, dist.coef, "sgd coef")
    ds.unpersist()
  }

  test("GD local finish ≡ distributed: Adam + hinge, forced empties") {
    import spark.implicits._
    val ds = spark.createDataset(docs(5, 23)).repartition(7).persist()
    val cfg = GradientDescent.Config(iterations = 15,
      learningRate = 0.02, optimizer = "Adam",
      reg = GradientDescent.SvmNorm(0.5))
    val local = GradientDescent.run(ds, Dim, HingeLoss, cfg)
    val dist = GradientDescent.run(ds, Dim, HingeLoss, cfg,
      localFinishRows = 0L)
    arrEq(local.costs, dist.costs, "adam costs")
    arrEq(local.coef, dist.coef, "adam coef")
    ds.unpersist()
  }

  test("GD byte gate: tiny localFinishBytes falls back to distributed") {
    import spark.implicits._
    val ds = spark.createDataset(docs(30, 31)).repartition(3).persist()
    val cfg = GradientDescent.Config(iterations = 10,
      learningRate = 0.05)
    val viaBytes = GradientDescent.run(ds, Dim, LogisticLoss, cfg,
      localFinishBytes = 1L)
    val dist = GradientDescent.run(ds, Dim, LogisticLoss, cfg,
      localFinishRows = 0L)
    arrEq(viaBytes.costs, dist.costs, "bytegate costs")
    arrEq(viaBytes.coef, dist.coef, "bytegate coef")
    ds.unpersist()
  }

  test("NN local finish ≡ distributed: SGD and Adam, params + curves") {
    import spark.implicits._
    val cfg0 = TwoLayerNet.Config(nIn = Dim, nHidden = 16, nOut = 2,
      iterations = 12, learningRate = 0.01, seed = 99L)
    val ds = spark.createDataset(docs(60, 47)).repartition(5).persist()
    for (opt <- Seq("SGD", "Adam")) {
      val cfg = cfg0.copy(optimizer = opt)
      val local = TwoLayerNet.train(ds, cfg)
      val dist = TwoLayerNet.train(ds, cfg, localFinishRows = 0L)
      arrEq(local.costs, dist.costs, s"nn $opt costs")
      arrEq(local.params.w1, dist.params.w1, s"nn $opt w1")
      arrEq(local.params.b1, dist.params.b1, s"nn $opt b1")
      arrEq(local.params.w2, dist.params.w2, s"nn $opt w2")
      arrEq(local.params.b2, dist.params.b2, s"nn $opt b2")
    }
    ds.unpersist()
  }

  test("NN byte gate falls back to distributed") {
    import spark.implicits._
    val cfg = TwoLayerNet.Config(nIn = Dim, nHidden = 8, nOut = 2,
      iterations = 6, learningRate = 0.01, seed = 7L)
    val ds = spark.createDataset(docs(20, 53)).repartition(3).persist()
    val viaBytes = TwoLayerNet.train(ds, cfg, localFinishBytes = 1L)
    val dist = TwoLayerNet.train(ds, cfg, localFinishRows = 0L)
    arrEq(viaBytes.costs, dist.costs, "nn bytegate costs")
    arrEq(viaBytes.params.w1, dist.params.w1, "nn bytegate w1")
    ds.unpersist()
  }
}
