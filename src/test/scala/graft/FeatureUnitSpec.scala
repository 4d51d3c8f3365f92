package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.features.{TfIdf, Vocabulary}
import graft.gd.{GradientDescent, HingeLoss, SparseDoc}
import graft.text.Analysis

/** Unit coverage for branches the oracle queries don't reach: the
  * count-based (non-parity) TF path, vocabulary tie-breaking, BPE-ish
  * token counting on crafted strings, and early-stop iteration
  * pinning.
  */
class FeatureUnitSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("TfIdf exactParity=false uses real counts, parity path presence") {
    import spark.implicits._
    // one doc: "a a b"; vocab {a->0, b->1}; N=1 so idf=ln(1/1)=0 for
    // both — use two docs so idf differs from zero for one word.
    val docs = Seq(
      ("d1", "x", Seq("a", "a", "b")),
      ("d2", "x", Seq("b"))).toDF("id", "label", "tokens")
    val vocab = Seq(("a", 2L, 0), ("b", 2L, 1)).toDF("word", "cnt", "id")

    def values(exact: Boolean): Map[(String, Int), Double] =
      TfIdf.transform(docs, "id", "label", "tokens", vocab, 2,
        exactParity = exact)
        .collect()
        .flatMap(d => d.indices.zip(d.values).map { case (i, v) =>
          (d.id, i) -> v
        }).toMap

    val n = 2.0
    val idfA = math.log(n / 1) // a in 1 doc
    val idfB = math.log(n / 2) // b in both -> 0
    val parity = values(exact = true)
    // presence TF: a -> 1/3 * ln2
    assert(math.abs(parity(("d1", 0)) - 1.0 / 3 * idfA) < 1e-15)
    assert(parity(("d1", 1)) === 1.0 / 3 * idfB)
    val counts = values(exact = false)
    // count TF: a appears twice -> 2/3 * ln2
    assert(math.abs(counts(("d1", 0)) - 2.0 / 3 * idfA) < 1e-15)
  }

  test("Vocabulary.topK: count desc, word asc tie-break, dense ids") {
    import spark.implicits._
    val toks = Seq(Seq("b", "c", "a", "a"), Seq("c", "b"))
      .toDF("tokens")
    val v = Vocabulary.topK(toks, "tokens", 3)
      .orderBy(col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // counts: a=2, b=2, c=2 — all tied → pure word-asc order
    assert(v.toSeq == Seq(("a", 2L, 0), ("b", 2L, 1), ("c", 2L, 2)))
  }

  test("BPE-ish regex: contractions, digit runs, punct runs") {
    import spark.implicits._
    def count(s: String): Int =
      Seq(s).toDF("text")
        .select(size(regexp_extract_all(col("text"),
          lit(Analysis.BpeIshRe), lit(0))))
        .head().getInt(0)
    assert(count("hello world") === 2)   // "hello", " world"
    assert(count("it's fine") === 3)     // "it", "'s", " fine"
    assert(count("a 1234 b!!") === 4)    // "a", " 1234", " b", "!!"
    assert(count("") === 0)
  }

  test("early stop halts at the first |Δcost| ≤ delta iteration") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      SparseDoc("a", 1.0, Array(0), Array(0.5)),
      SparseDoc("b", 0.0, Array(1), Array(0.4)))).coalesce(1)
    val res = GradientDescent.run(ds, 2, HingeLoss,
      GradientDescent.Config(iterations = 50, learningRate = 0.01,
        optimizer = "SGD", earlyStopDelta = Some(1e9)))
    // delta so large the very first comparison (|0 - cost₁|) trips it
    assert(res.costs.length === 1)
  }
}
