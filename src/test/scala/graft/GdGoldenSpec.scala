package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gd._

/** Golden-curve tests for the optimizer zoo (SURVEY.md §2.11 L1/L2/L4
  * quirks included): expected cost curves + final coefficients were
  * computed with numpy implementing the reference's update rules
  * verbatim (`LR_Optimizers.py:125-190`, `RDD_SVM.py:117-160`) on the
  * 4-doc/6-dim fixture below, and committed to
  * `src/test/resources/gd_golden.txt`. A drift in any update rule —
  * epsilon, Adam's 10000 second-moment init, RMSprop's gti/(i+1),
  * Nesterov's lagged prev_mom, bold-driver order — fails these.
  */
class GdGoldenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dim = 6
  // identical to the fixture generator's docs
  def fixtureDocs: Seq[SparseDoc] = Seq(
    SparseDoc("a", 1.0, Array(0, 2, 4), Array(0.5, 0.25, 0.125)),
    SparseDoc("b", 0.0, Array(1, 3), Array(0.4, 0.2)),
    SparseDoc("c", 1.0, Array(0, 1, 5), Array(0.3, 0.1, 0.6)),
    SparseDoc("d", 0.0, Array(2, 4, 5), Array(0.7, 0.35, 0.05)))

  val initCoef = Array(0.05, -0.03, 0.02, 0.11, -0.07, 0.005)

  lazy val golden: Map[String, Array[Double]] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/gd_golden.txt"))
    try src.getLines().map { line =>
      val parts = line.split(" ")
      parts.head -> parts.tail.map(_.toDouble)
    }.toMap
    finally src.close()
  }

  def ds = {
    import spark.implicits._
    spark.createDataset(fixtureDocs).coalesce(1)
  }

  def check(opt: String): Unit = {
    val res = GradientDescent.run(ds, dim, LogisticLoss,
      GradientDescent.Config(iterations = 10, learningRate = 0.01,
        optimizer = opt, reg = GradientDescent.L2(1.15),
        initialCoef = Some(initCoef)))
    val expCosts = golden(s"$opt.costs")
    val expCoef = golden(s"$opt.coef")
    assert(res.costs.length == expCosts.length)
    res.costs.zip(expCosts).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"$opt cost[$i]: got $g expected $e")
    }
    res.coef.zip(expCoef).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"$opt coef[$i]: got $g expected $e")
    }
  }

  test("L1/L4 SGD matches numpy reference")      { check("SGD") }
  test("L4 Momentum matches numpy reference")    { check("Momentum") }
  test("L4 Nesterov (lagged prev_mom) matches")  { check("Nesterov") }
  test("L4 Adam (second_mom init 10000) matches"){ check("Adam") }
  test("L4 Adagrad matches numpy reference")     { check("Adagrad") }
  test("L4 RMSprop (gti/(i+1)) matches")         { check("RMSprop") }

  test("L2 hinge loss + SvmNorm reg matches numpy reference") {
    val res = GradientDescent.run(ds, dim, HingeLoss,
      GradientDescent.Config(iterations = 10, learningRate = 0.01,
        optimizer = "SGD",
        reg = GradientDescent.SvmNorm(1.0 / (0.5 * 4)),
        initialCoef = Some(initCoef)))
    val expCosts = golden("SVM_SGD.costs")
    val expCoef = golden("SVM_SGD.coef")
    res.costs.zip(expCosts).foreach { case (g, e) =>
      assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"svm cost: got $g expected $e")
    }
    res.coef.zip(expCoef).foreach { case (g, e) =>
      assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"svm coef: got $g expected $e")
    }
  }

  test("F8/F13: predict + confusion on a hand-computed fixture") {
    // coef chosen so: a → dot=0.5*1+0.25*0+... pick simple coef
    val coef = Array(1.0, -1.0, 0.0, 0.0, 0.0, 0.5)
    // a: 0.5 > 0 → pred 1, y 1 → tp
    // b: -0.4 → pred 0, y 0 → tn
    // c: 0.3 - 0.1 + 0.3 = 0.5 → pred 1, y 1 → tp
    // d: 0.025 > 0 → pred 1, y 0 → fp
    val c = Predict.evaluate(ds, coef)
    assert(c == Predict.Confusion(2, 1, 1, 0))
    assert(math.abs(c.f1 - 2.0 / 2.5) < 1e-15)
    assert(math.abs(c.accuracy - 0.75) < 1e-15)
  }
}
