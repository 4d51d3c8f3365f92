package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

/** The t16 oracle only proves the trivial regime (31 distinct tokens
  * < k−1 counters, the sketch never evicts). This spec drives the
  * Misra–Gries stage where it actually works for a living: a domain
  * far larger than the counter budget, planted hot keys, and
  * multi-partition merges.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("planted hot keys survive eviction and merge; output is exact") {
    import spark.implicits._
    // 200k rows: 3 hot keys at ~10%/6%/3%, the rest spread over a
    // 50k-item domain (every cold key far below n/k)
    val rng = new scala.util.Random(41L)
    val rows = Seq.tabulate(200000) { i =>
      val r = rng.nextDouble()
      if (r < 0.10) "hot_a"
      else if (r < 0.16) "hot_b"
      else if (r < 0.19) "hot_c"
      else s"cold_${rng.nextInt(50000)}"
    }
    val df = rows.toDF("item").repartition(8)
    val k = 20 // threshold n/k = 10k rows = 5%
    val got = HeavyHitters.topFrequent(df, "item", k)
      .as[(String, Long)].collect().toMap
    // exact reference
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = exact.filter { case (_, c) => c * k > rows.size }
    assert(got == expect)
    assert(got.keySet == Set("hot_a", "hot_b")) // hot_c ~3% < 5%
  }

  test("no heavy hitter → empty frame with the contract schema") {
    import spark.implicits._
    val df = (0 until 10000).map(i => s"u$i").toDF("item")
    val got = HeavyHitters.topFrequent(df, "item", 10)
    assert(got.columns.toSeq == Seq("item", "n_occ"))
    assert(got.count() == 0)
  }

  test("sketch candidate set is a superset of true >n/k items at any " +
      "partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge._
    val rng = new scala.util.Random(7L)
    val rows = Seq.tabulate(50000)(i =>
      if (rng.nextDouble() < 0.08) "hot" else s"c${rng.nextInt(5000)}")
    for (parts <- Seq(1, 3, 16)) {
      val df = rows.toDF("item").repartition(parts)
      val sketch = column(graft.expressions.MisraGriesAgg(
        expression(col("item")), 12).toAggregateExpression())
      val cands = df.agg(sketch).head()
        .getSeq[org.apache.spark.sql.Row](0).map(_.getString(0)).toSet
      assert(cands.size <= 11, s"parts=$parts overflowed the budget")
      assert(cands.contains("hot"), s"parts=$parts lost the hot key")
    }
  }
}
