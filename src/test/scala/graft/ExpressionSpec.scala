package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{GraftExtensions, LemmatizeWord}
import graft.text.Lemmatizer

/** The native lemmatizer expression: codegen and interpreted paths
  * must agree with the driver-side function, compose under `transform`
  * (array path), and resolve from SQL via GraftExtensions.
  */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // fresh session so withExtensions applies even when another suite
    // already created one in this JVM (the SparkContext is reused)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  val words = Seq("wolves", "fires", "cities", "boxes", "bus",
    "children", "glass", "axes", "x", "is")

  test("codegen path agrees with the driver-side lemma function") {
    import spark.implicits._
    val got = words.toDF("w")
      .select(Lemmatizer.lemmatize(col("w"))).as[String].collect()
    assert(got.toSeq == words.map(Lemmatizer.lemma))
  }

  test("interpreted (non-codegen) eval agrees too") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    words.foreach { w =>
      val e = LemmatizeWord(Literal(UTF8String.fromString(w),
        org.apache.spark.sql.types.StringType))
      assert(e.eval(null) ==
        UTF8String.fromString(Lemmatizer.lemma(w)))
    }
    // null-intolerant: null in → null out
    assert(LemmatizeWord(Literal(null,
      org.apache.spark.sql.types.StringType)).eval(null) == null)
  }

  test("array path: transform(tokens, lemmatize) — no UDF in the plan") {
    import spark.implicits._
    val df = Seq(Seq("wolves", "fires", "running")).toDF("toks")
      .select(Lemmatizer.lemmatizeAll(col("toks")).as("lemmas"))
    assert(df.as[Seq[String]].head() == Seq("wolf", "fire", "running"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF leaked into plan:\n$plan")
  }

  test("SQL registry: graft_lemmatize callable from SQL text") {
    val r = spark.sql(
      "SELECT graft_lemmatize('hypotheses') AS l").head().getString(0)
    assert(r == "hypothesis")
  }

  test("SimHash60 agrees with the composed-HOF form bit for bit") {
    import spark.implicits._
    import graft.operators.Dedup
    val rng = new scala.util.Random(0xD04L)
    val rows = Seq.fill(200)(Seq.fill(1 + rng.nextInt(40))(rng.nextLong()))
    val df = rows.toDF("hvs")
    val got = df.select(
        Dedup.simhashNative(col("hvs")).as("native"),
        Dedup.simhashFromHashes(col("hvs")).as("composed"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, c) => assert(n == c) }
    // empty array → fingerprint 0 on both forms
    val empty = Seq(Seq.empty[Long]).toDF("hvs")
      .select(Dedup.simhashNative(col("hvs")).as("n"),
        Dedup.simhashFromHashes(col("hvs")).as("c"))
      .as[(Long, Long)].head()
    assert(empty == ((0L, 0L)))
  }

  test("SimHash60 interpreted eval and null handling") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    import graft.expressions.SimHash60
    // all-ones hash → every bit votes +1 → all 60 bits set
    val all = SimHash60(Literal(new GenericArrayData(Array(-1L)),
      ArrayType(LongType))).eval(null)
    assert(all == (1L << 60) - 1)
    // a null element votes −1 everywhere: {hv=-1, null} ties every
    // bit at 0, and ties don't set bits (vote > 0 is strict)
    val tied = SimHash60(Literal(
      new GenericArrayData(Array[Any](-1L, null)),
      ArrayType(LongType))).eval(null)
    assert(tied == 0L)
    // null array in → null out
    assert(SimHash60(Literal(null, ArrayType(LongType))).eval(null) == null)
  }

  test("SimHashText fuses the whole chain and matches the composed form") {
    import spark.implicits._
    import graft.operators.Dedup
    val rng = new scala.util.Random(0xD04DL)
    val vocab = Vector("storm", "flood", "quake", "fire", "calm",
      "ok", "évênt", "日本語", "x1", "", "a b")
    val rows = Seq.fill(150)(
      Seq.fill(1 + rng.nextInt(30))(vocab(rng.nextInt(vocab.size))))
    val got = rows.toDF("toks")
      .select(Dedup.simhashTextNative(col("toks")).as("fused"),
        Dedup.simhash(col("toks")).as("composed"))
      .as[(Long, Long)].collect()
    got.foreach { case (f, c) => assert(f == c) }
  }

  test("SQL registry: graft_simhash60 callable from SQL text") {
    val r = spark.sql(
      "SELECT graft_simhash60(array(1L, 1L, 1L)) AS fp").head().getLong(0)
    assert(r == 1L) // bit 0 unanimous, all other bits vote −3
  }

  test("declared input types: non-string args cast at analysis, no CCE") {
    // ImplicitCastInputTypes: an int literal arrives as a cast-to-string,
    // not a runtime ClassCastException deep inside eval
    val r = spark.sql("SELECT graft_lemmatize(123) AS l").head().getString(0)
    assert(r == "123")
    val sig = spark.sql(
      "SELECT graft_minhash(42, 4) AS s").head().getSeq[String](0)
    assert(sig.size == 4 && sig.forall(_.length == 8))
  }
}
