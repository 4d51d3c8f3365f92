package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Planted-fixture test for the curation funnel: every gate (language,
  * token count, lexical diversity, exact-dup) rejects its planted
  * offender and nothing else; the dedup keeps the LOWEST doc_id.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ≥20 tokens, diverse, carries English markers ("the", "is", "it");
  // "it's" splits into two BPE-ish matches, so bpe_tokens > n_tokens
  val good =
    "the quick brown fox jumps over a lazy dog while it's twenty " +
    "extra words keep this document comfortably above minimum count is"

  test("each curation gate drops exactly its planted offender") {
    import spark.implicits._
    val docs = Seq(
      1L -> good,                                   // keeper
      2L -> good,                                   // exact dup of 1 → dropped
      3L -> ("der hund und die katze das ist ein nicht mit von haus " +
        "baum wasser feuer erde luft stein berg tal fluss"), // German
      4L -> "the cat is small",                     // too short
      5L -> ("the " + Seq.fill(30)("spam").mkString(" ")), // low TTR
      6L -> (good + " unique trailing marker")      // keeper, distinct
    ).toDF("doc_id", "text")

    val out = Curation.curate(docs, "doc_id", "text",
        keepLang = "en", minTokens = 20, minTtr = 0.35)
      .orderBy("doc_id")
      .collect()

    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 6L),
      s"kept ${out.map(_.getLong(0)).mkString(",")}")
    val r1 = out.head
    assert(r1.getString(1) == "en")                  // lang_pred
    assert(r1.getInt(2) >= 20)                       // n_tokens
    assert(r1.getDouble(3) >= 0.35)                  // ttr
    assert(r1.getInt(4) > r1.getInt(2))              // bpe ≥ ws tokens here
    assert(r1.getString(5).length == 32)             // md5 fp
  }

  test("dedup keeps the lowest doc_id of an exact-duplicate group") {
    import spark.implicits._
    val docs = Seq(9L -> good, 3L -> good, 7L -> good)
      .toDF("doc_id", "text")
    val kept = Curation.curate(docs, "doc_id", "text").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("upsert: latest version wins, tombstones drop, a later version " +
      "resurrects, base stays unshuffled behind a broadcast anti join") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e"))
      .toDF("id", "v")
    val delta = Seq(
      (2L, "b1", 1L, false), (2L, "b2", 2L, false), // v2 beats v1
      (3L, "x", 1L, true),                          // tombstone → dropped
      (5L, "x", 1L, true), (5L, "e2", 2L, false),   // later v resurrects
      (4L, "d", 1L, false)                          // insert
    ).toDF("id", "v", "version", "is_delete")
    val out = Curation.upsert(base, delta, "id", "version", "is_delete")
    assert(out.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b2"), (4L, "d"), (5L, "e2")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"base side should anti-join against a broadcast key set:\n$plan")
  }

  test("scd2: intervals chain gaplessly per key, exactly one current " +
      "version, single-version keys are current from birth") {
    import spark.implicits._
    val log = Seq(
      (1L, "a1", 10L), (1L, "a3", 30L), (1L, "a2", 20L), // 3 versions
      (2L, "b1", 15L),                                   // 1 version
      (3L, "c2", 40L), (3L, "c1", 5L)                    // 2 versions
    ).toDF("id", "v", "ts")
    val out = Curation.scd2(log, "id", "ts")
      .select($"id", $"v", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(out == Set(
      (1L, "a1", 10L, Some(20L), false),
      (1L, "a2", 20L, Some(30L), false),
      (1L, "a3", 30L, None, true),
      (2L, "b1", 15L, None, true),
      (3L, "c1", 5L, Some(40L), false),
      (3L, "c2", 40L, None, true)))
    // structural invariants: per key, exactly one open interval and
    // every valid_to equals the next valid_from (no gap, no overlap)
    for (k <- Seq(1L, 2L, 3L)) {
      val vs = out.filter(_._1 == k).toSeq.sortBy(_._3)
      assert(vs.count(_._5) == 1)
      vs.sliding(2).foreach {
        case Seq(prev, next) => assert(prev._4.contains(next._3))
        case _ =>
      }
    }
    // the whole plan is one window over the log's key partitioning —
    // no join, no second shuffle
    val plan = Curation.scd2(log, "id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"scd2 must not join:\n$plan")
  }

  test("c08 snapshot diff: planted epochs yield exactly their add/remove/change rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ids 0..20: prev drops 3,10,17 (id%7=3); cur drops 2,7,12,17
    // (id%5=2); cur revises 0,3,6,9,12,15,18 (id%3=0) — the same
    // derivations the c08 gate query applies to the documents table
    val docs = (0L to 20L).map(i => (i, s"text of doc $i"))
      .toDF("doc_id", "text")
    val prev = docs.filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"), md5(col("text")).as("old_fp"))
    val cur = docs.filter(col("doc_id") % 5 =!= 2)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" rev")))
          .otherwise(col("text"))).as("new_fp"))
    val rows = Curation.snapshotDiff(prev, cur, "doc_id").collect()
    val byStatus = rows.map(r => r.getLong(0) -> r.getString(1)).toSeq
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    // added: in cur, not prev = {3, 10} (17 is dropped from cur too)
    assert(byStatus("added") == Seq(3L, 10L))
    // removed: in prev, not cur = {2, 7, 12}
    assert(byStatus("removed") == Seq(2L, 7L, 12L))
    // changed: present both sides, id%3=0, minus added/removed
    assert(byStatus("changed") == Seq(0L, 6L, 9L, 15L, 18L))
    // fingerprints travel: changed rows carry both, added/removed one
    rows.foreach { r =>
      r.getString(1) match {
        case "added"   => assert(r.isNullAt(2) && !r.isNullAt(3))
        case "removed" => assert(!r.isNullAt(2) && r.isNullAt(3))
        case "changed" => assert(!r.isNullAt(2) && !r.isNullAt(3) &&
          r.getString(2) != r.getString(3))
      }
    }
  }

  test("c10 quarantine routing: each corruption class quarantines, valid lines parse, nothing dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val lines = Seq(
      1L -> """{"id":1,"lang":"en","n_chars":10}""", // valid
      2L -> """{"id":2,"lang":"de""",                // truncated
      3L -> "",                                      // empty line
      4L -> "not json at all",                       // garbage
      5L -> """{"lang":"fr","n_chars":5}""",         // missing id field
      6L -> """{"id":6}"""                           // valid, sparse
    ).toDF("line_id", "raw")
    val out = lines.withColumn("j", from_json($"raw", schema))
      .select($"line_id",
        when($"j"("id").isNull, "quarantined").otherwise("ok")
          .as("status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "ok", 2L -> "quarantined",
      3L -> "quarantined", 4L -> "quarantined",
      5L -> "quarantined", // no id ⇒ not ingestible, by policy
      6L -> "ok"))
    assert(out.size == 6) // row count preserved: nothing eaten
  }

  test("c13 observed ingest leaves the shared session serializable " +
      "(Observation isolation regression)") {
    // Spark 4.1 classic: Dataset.observe(Observation, ...) registers
    // the observation in the session's ObservationManager and never
    // unregisters it; a non-empty manager makes the SESSION
    // Java-unserializable, which killed later spark.ml trainings
    // ("Task not serializable ... ObservationManager") in full gate
    // runs. c13 must run its observed pass on an isolated
    // newSession(), so serializing the shared session afterwards
    // still works.
    val out = queries.CurationQueries
      .queries("c13_observed_ingest")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 1 && out.head.getLong(0) > 0)
    val oos = new java.io.ObjectOutputStream(
      java.io.OutputStream.nullOutputStream())
    try oos.writeObject(spark) // throws NotSerializableException on regression
    finally oos.close()
  }

  test("c09 mergeable rollup: persisted epoch + delta merge equals full recompute; sketch unions, not adds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // epoch 1: 40 docs over 2 sources; epoch 2: 20 docs, of which 10
    // REPEAT epoch-1 content — a sketch that merged by addition
    // (instead of union) would estimate ~60 distinct, the truth is 50
    val e1 = (0 until 40).map(i =>
      (i.toLong, s"src${i % 2}", s"unique text $i", 100L + i))
    val e2 = (40 until 60).map { i =>
      val txt = if (i < 50) s"unique text ${i - 40}" // dup of epoch 1
        else s"unique text $i"
      (i.toLong, s"src${i % 2}", txt, 100L + i)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("c09-spec-").toString + "/rollup"
    def df(rows: Seq[(Long, String, String, Long)]) =
      rows.toDF("doc_id", "source", "text", "n_chars")
    Curation.sketchRollup(df(e1), "source", "n_chars", md5($"text"))
      .write.parquet(dir)
    val merged = Curation.mergeRollups(
        spark.read.parquet(dir).unionByName(
          Curation.sketchRollup(df(e2), "source", "n_chars",
            md5($"text"))),
        "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap // est is LONG
    val full = df(e1 ++ e2)
    val exact = full.groupBy($"source")
      .agg(count(lit(1)), sum($"n_chars"),
        countDistinct(md5($"text")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (src <- Seq("src0", "src1")) {
      val (mN, mS, mEst) = merged(src)
      val (eN, eS, eD) = exact(src)
      assert(mN == eN && mS == eS,
        s"$src additive merge must equal full recompute")
      // union semantics: estimate tracks the 25 distinct per source,
      // nowhere near the 30 an additive merge would give
      assert(math.abs(mEst - eD) <= 0.05 * eD,
        s"$src sketch estimate $mEst vs exact $eD")
    }
  }
}
