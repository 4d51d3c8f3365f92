package graft.gd

import org.apache.spark.sql.Dataset

/** Full-batch gradient descent driven from the driver, with the
  * per-iteration gradient computed distributed (SURVEY.md §2.11,
  * §3.2).
  *
  * Scale design vs the reference:
  *  - coefficients ship via `SparkContext.broadcast` (torrent, one
  *    copy per executor) instead of task-closure pickling;
  *  - the (cost, gradient) reduce is a depth-2 `treeAggregate` —
  *    executor-side partial combines, then a tree to the driver,
  *    instead of the reference's pairwise `reduce` fan-in;
  *  - callers must `.persist()` the featurized Dataset (the reference
  *    recomputes the whole TF-IDF lineage on every iteration —
  *    SURVEY.md §2.10 R2).
  */
object GradientDescent {

  /** Regularization variants (both reference flavors). */
  sealed trait Reg extends Serializable {
    def apply(cost: Double, grad: Array[Double],
              coef: Array[Double]): Double
  }

  /** LR flavor (`RDD_logisticregression.py:144-145`):
    * grad += 2λβ; cost += λΣβ². */
  final case class L2(lambda: Double) extends Reg {
    def apply(cost: Double, grad: Array[Double],
              coef: Array[Double]): Double = {
      var s = 0.0
      var k = 0
      while (k < coef.length) {
        grad(k) += 2 * lambda * coef(k)
        s += coef(k) * coef(k)
        k += 1
      }
      cost + lambda * s
    }
  }

  /** SVM flavor (`RDD_SVM.py:142-143`): grad += λw;
    * cost += (λ/2)·‖w‖ — the reference adds the *unsquared* L2 norm.
    */
  final case class SvmNorm(lambda: Double) extends Reg {
    def apply(cost: Double, grad: Array[Double],
              coef: Array[Double]): Double = {
      var s = 0.0
      var k = 0
      while (k < coef.length) {
        grad(k) += lambda * coef(k)
        s += coef(k) * coef(k)
        k += 1
      }
      cost + (lambda / 2) * math.sqrt(s)
    }
  }

  case object NoReg extends Reg {
    def apply(cost: Double, grad: Array[Double],
              coef: Array[Double]): Double = cost
  }

  case class Config(
      iterations: Int = 300,
      learningRate: Double = 0.01,
      optimizer: String = "SGD",
      reg: Reg = NoReg,
      boldDriver: Boolean = true,
      earlyStopDelta: Option[Double] = None,
      initialCoef: Option[Array[Double]] = None)

  case class Result(coef: Array[Double], costs: Array[Double])

  def run(data: Dataset[SparseDoc], dim: Int, loss: Loss,
          cfg: Config): Result = {
    val sc = data.sparkSession.sparkContext
    val coef = cfg.initialCoef.map(_.clone())
      .getOrElse(new Array[Double](dim))
    require(coef.length == dim)
    val opt = Optimizer(cfg.optimizer, dim)
    var lr = cfg.learningRate
    var oldCost = 0.0 // reference starts old_cost at 0 → first bold-
                      // driver step always halves lr
    val costs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val rdd = data.rdd
    // depth-2 tree reduce only pays when there are enough partitions
    // to fan in (an intermediate stage per iteration otherwise): local
    // runs with a handful of partitions aggregate directly; a
    // 1000-executor job gets the tree.
    val depth = if (rdd.getNumPartitions <= 16) 1 else 2

    var i = 0
    var stopped = false
    while (i < cfg.iterations && !stopped) {
      val bc = sc.broadcast(coef)
      val (costSum, gradSum) = rdd.treeAggregate(
        (0.0, new Array[Double](dim)))(
        seqOp = { case ((c, g), doc) =>
          (c + loss.accumulate(doc, bc.value, g), g)
        },
        combOp = { case ((c1, g1), (c2, g2)) =>
          var k = 0
          while (k < dim) { g1(k) += g2(k); k += 1 }
          (c1 + c2, g1)
        },
        depth = depth)
      bc.destroy()

      val cost = cfg.reg(costSum, gradSum, coef)
      opt.update(coef, gradSum, lr, i)

      if (cfg.boldDriver) {
        lr = if (cost < oldCost) lr * 1.05 else lr * 0.5
      }
      costs += cost
      if (cfg.earlyStopDelta.exists(d => math.abs(oldCost - cost) <= d))
        stopped = true
      oldCost = cost
      i += 1
    }
    Result(coef, costs.toArray)
  }

  /** Indices of the 5 largest coefficients, matching `top5coeff`
    * (`RDD_logisticregression.py:112-125`: selects by raw value, then
    * orders those 5 by |value|).
    */
  def top5Coeff(coef: Array[Double]): Seq[Int] = {
    val top5ByValue = coef.zipWithIndex.sortBy(-_._1).take(5)
    top5ByValue.sortBy { case (v, _) => math.abs(v) }.map(_._2).toSeq
  }
}
