package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Csv
import graft.ml.TweetPipeline

/** Stack A end-to-end: native CSV scan parity with the reference's
  * pandas reader, prep-column invariants, and classifier quality
  * within tolerance of BASELINE.md (splits are seeded here while the
  * reference's Stack A split is unseeded — SURVEY.md §5 #5 — so
  * quality is a tolerance band, not an exact match).
  */
class MlPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val raw = Csv.tweets(spark, Csv.TrainCsv).cache()
  lazy val featurized = TweetPipeline.featurize(raw).cache()

  test("S1: multiLine CSV scan matches the pandas reader's shape") {
    // pandas: 7,613 rows (SURVEY.md §6); a naive non-multiLine read
    // splits quoted embedded newlines into extra rows.
    assert(raw.count() === 7613L)
    assert(raw.columns.toSeq === Seq("id", "text", "class"))
  }

  test("S4: inferSchema CSV scan types the numeric columns") {
    val df = Csv.inferred(spark, Csv.TrainCsv)
    assert(df.count() === 7613L)
    assert(df.schema("id").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(df.schema("target").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(df.schema("text").dataType ===
      org.apache.spark.sql.types.StringType)
  }

  test("SQL surface: registered views answer spark.sql directly") {
    graft.core.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
    val ev = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= timestamp'2024-01-01'")
      .head().getLong(0)
    assert(ev > 0)
  }

  test("A11: class balance 4342/3271 (Part1.ipynb cell 15)") {
    val counts = raw.groupBy("class").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("0" -> 4342L, "1" -> 3271L))
  }

  test("golden: per-class prep averages match Part1.ipynb cells 17/20/21") {
    // the reference notebook prints these exact values (deterministic
    // — no split involved); our UDF-free prep chain must reproduce
    // them to float precision.
    val stats = TweetPipeline.prepare(raw)
      .groupBy("class")
      .agg(avg("length").as("al"), avg("tokens").as("at"),
        avg("filtered_tokens").as("af"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(close(stats("0")._1, 79.06264394288347), stats("0"))
    assert(close(stats("1")._1, 87.44053806175482), stats("1"))
    assert(close(stats("0")._2, 16.797328420082913), stats("0"))
    assert(close(stats("1")._2, 17.73800061143381), stats("1"))
    assert(close(stats("0")._3, 11.324965453707968), stats("0"))
    assert(close(stats("1")._3, 13.161112809538368), stats("1"))
  }

  test("prep: tokenizer artifacts match the reference semantics") {
    val prepared = TweetPipeline.prepare(raw)
    val row = prepared.filter(col("id") === "1")
      .select("clean", "tokens", "filtered_tokens").head()
    // "Our Deeds are the Reason of this #earthquake May ALLAH Forgive
    //  us all" → '#' becomes a space → "this  earthquake" double space
    // → one empty token survives in token_text.
    assert(row.getString(0) ==
      "our deeds are the reason of this  earthquake may allah forgive us all")
    assert(row.getInt(1) === 14) // 13 words + 1 empty-string token
    // default-list stops removed (our,are,the,of,this,all — "may"/"us"
    // are NOT in the default English list): deeds, reason, earthquake,
    // may, allah, forgive, us + the surviving empty token = 8.
    assert(row.getInt(2) === 8)
  }

  test("features: assembled dim = vocab + 1 (token count column)") {
    val dim = featurized.select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0).size
    assert(dim > 10000) // CountVectorizer default 2^18 cap, real vocab ~20k
  }

  test("M9/M14: NaiveBayes quality ≈ baseline 78.41% acc / 78.4 f1") {
    val r = TweetPipeline.trainEval("nb", featurized)
    assert(r.accuracy > 0.74 && r.accuracy < 0.83,
      s"nb accuracy ${r.accuracy}")
    assert(r.f1 > 0.74 && r.f1 < 0.83, s"nb f1 ${r.f1}")
  }

  test("M8/M14: LogisticRegression quality ≈ baseline 79.16% acc / 78.2 f1") {
    val r = TweetPipeline.trainEval("lr", featurized)
    assert(r.accuracy > 0.74 && r.accuracy < 0.84,
      s"lr accuracy ${r.accuracy}")
    assert(r.f1 > 0.73 && r.f1 < 0.84, s"lr f1 ${r.f1}")
  }

  test("M11: DecisionTree quality ≈ baseline 60.63% acc (weak learner)") {
    val r = TweetPipeline.trainEval("dt", featurized)
    assert(r.accuracy > 0.55 && r.accuracy < 0.70,
      s"dt accuracy ${r.accuracy}")
  }

  test("M10: LinearSVC quality ≈ baseline 78.02% acc / 77.6 f1") {
    val r = TweetPipeline.trainEval("svc", featurized)
    assert(r.accuracy > 0.73 && r.accuracy < 0.83,
      s"svc accuracy ${r.accuracy}")
    assert(r.f1 > 0.72 && r.f1 < 0.83, s"svc f1 ${r.f1}")
  }

  test("sweep (Part1 cell 32): regParam grid reproduces the known shape") {
    // the notebook's sweep shows quality degrading at strong
    // regularization (regParam 10 → majority-class collapse vs ~0.79
    // at 1.25); two grid points capture that shape cheaply.
    val rs = TweetPipeline.sweepRegParam("lr", Seq(1.25, 10.0),
      featurized)
    assert(rs.head.accuracy > 0.74)
    assert(rs.last.accuracy < rs.head.accuracy)
  }

  test("M12: RandomForest quality ≈ baseline 62.09% acc (weak learner)") {
    val r = TweetPipeline.trainEval("rf", featurized)
    assert(r.accuracy > 0.55 && r.accuracy < 0.72,
      s"rf accuracy ${r.accuracy}")
  }
}
