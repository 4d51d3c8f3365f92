package graft.gd

/** The reference's optimizer zoo (`LR_Optimizers.py:155-184`,
  * SURVEY.md §2.11 L4), update-for-update including its documented
  * quirks, which are reproduced deliberately for golden-curve parity
  * (SURVEY.md §7 "What's hard" #1):
  *
  *  - epsilon is `10e-8` = 1e-7 (not 1e-8);
  *  - Adam's second moment starts at `np.array(10000)` — a 0-d array
  *    holding the scalar 10000, broadcast over the vector;
  *  - RMSprop's running average uses `beta * gti/(i+1)` where gti is
  *    the *sum* of squared gradients so far;
  *  - Nesterov's update applies the momentum lookahead one step late.
  *
  * All state is driver-local vectors (the distributed part of GD is
  * the gradient reduce, not the update rule).
  */
sealed trait Optimizer extends Serializable {
  /** In-place parameter update; `i` is the 0-based iteration. */
  def update(coef: Array[Double], grad: Array[Double], lr: Double,
             i: Int): Unit
}

object Optimizer {
  val Epsilon: Double = 10e-8 // = 1e-7, reference `LR_Optimizers.py:143`
  val Beta: Double = 0.9
  val Beta2: Double = 0.999

  def apply(name: String, dim: Int): Optimizer = name match {
    case "SGD"      => new Sgd
    case "Momentum" => new Momentum(dim)
    case "Nesterov" => new Nesterov(dim)
    case "Adam"     => new Adam(dim)
    case "Adagrad"  => new Adagrad(dim)
    case "RMSprop"  => new RmsProp(dim)
    case other => throw new IllegalArgumentException(s"unknown optimizer: $other")
  }
}

final class Sgd extends Optimizer {
  def update(c: Array[Double], g: Array[Double], lr: Double, i: Int): Unit = {
    var k = 0
    while (k < c.length) { c(k) -= lr * g(k); k += 1 }
  }
}

final class Momentum(dim: Int) extends Optimizer {
  private val m = new Array[Double](dim)
  def update(c: Array[Double], g: Array[Double], lr: Double, i: Int): Unit = {
    var k = 0
    while (k < dim) {
      m(k) = Optimizer.Beta * m(k) + lr * g(k)
      c(k) -= m(k)
      k += 1
    }
  }
}

/** Reference flavor (`LR_Optimizers.py:162-166`): the lookahead uses
  * `prev_mom`, which trails `momentum` by one iteration.
  */
final class Nesterov(dim: Int) extends Optimizer {
  private val m = new Array[Double](dim)
  private val prev = new Array[Double](dim)
  def update(c: Array[Double], g: Array[Double], lr: Double, i: Int): Unit = {
    var k = 0
    while (k < dim) {
      val tmp = c(k) - Optimizer.Beta * prev(k)
      c(k) = tmp - lr * g(k)
      k += 1
    }
    System.arraycopy(m, 0, prev, 0, dim)
    k = 0
    while (k < dim) {
      m(k) = Optimizer.Beta * m(k) + lr * g(k)
      k += 1
    }
  }
}

/** Reference flavor (`LR_Optimizers.py:168-173`): `second_mom` starts
  * as the scalar 10000 (`LR_Optimizers.py:141` `np.array(10000)`).
  */
final class Adam(dim: Int, secondMomInit: Double = 10000.0)
    extends Optimizer {
  private val m = new Array[Double](dim)
  private val v = Array.fill(dim)(secondMomInit)
  def update(c: Array[Double], g: Array[Double], lr: Double, i: Int): Unit = {
    val bc1 = 1.0 - math.pow(Optimizer.Beta, i + 1)
    val bc2 = 1.0 - math.pow(Optimizer.Beta2, i + 1)
    var k = 0
    while (k < dim) {
      m(k) = Optimizer.Beta * m(k) + (1 - Optimizer.Beta) * g(k)
      v(k) = Optimizer.Beta2 * v(k) + (1 - Optimizer.Beta2) * g(k) * g(k)
      val mHat = m(k) / bc1
      val vHat = v(k) / bc2
      c(k) -= lr * mHat / (math.sqrt(vHat) + Optimizer.Epsilon)
      k += 1
    }
  }
}

final class Adagrad(dim: Int) extends Optimizer {
  private val gti = new Array[Double](dim)
  def update(c: Array[Double], g: Array[Double], lr: Double, i: Int): Unit = {
    var k = 0
    while (k < dim) {
      gti(k) += g(k) * g(k)
      c(k) -= lr * g(k) / (math.sqrt(gti(k)) + Optimizer.Epsilon)
      k += 1
    }
  }
}

/** Reference flavor (`LR_Optimizers.py:180-184`): the "moving average"
  * term is `beta * gti/(i+1)` (gti = cumulative sum of g², divided by
  * iteration count), and gti is bumped *after* the update.
  */
final class RmsProp(dim: Int) extends Optimizer {
  private val gti = new Array[Double](dim)
  def update(c: Array[Double], g: Array[Double], lr: Double, i: Int): Unit = {
    var k = 0
    while (k < dim) {
      val sq = g(k) * g(k)
      val expGrad = Optimizer.Beta * gti(k) / (i + 1) +
        (1 - Optimizer.Beta) * sq
      c(k) -= lr / math.sqrt(expGrad + Optimizer.Epsilon) * g(k)
      gti(k) += sq
      k += 1
    }
  }
}
