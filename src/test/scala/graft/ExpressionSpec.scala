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
