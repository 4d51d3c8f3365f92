package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.text.TextOps

/** Hand-computable contracts for cross-document exact substring-span
  * dedup (d15, Lee et al. 2022 windowed ExactSubstr). The DuckDB
  * oracle proves engine parity on the corpus; these pin the policy
  * semantics on planted fixtures: keep-first canonicalization, span
  * merging across overlapping windows, island separation, and the
  * no-overlap/min-length output invariants.
  */
class SubstringSpansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def spans(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, Long)]] = {
    import spark.implicits._
    Dedup.substringSpans(docs.toDF("doc_id", "text"), "doc_id",
        TextOps.tokenize(col("text")), window = 5)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
  }

  test("shared passage: cut everywhere but its first occurrence, merged to one span") {
    val out = spans(Seq(
      1L -> "a b c d e f g h",
      // shares the 6-token run "a b c d e f" at positions 3..8
      2L -> "x y a b c d e f q r s"))
    // doc 1 holds the canonical occurrences → untouched
    assert(!out.contains(1L))
    // doc 2: duplicated 5-windows at pos 3 and 4 merge into one span
    // covering tokens 3..8 (6 tokens)
    assert(out(2L) == Seq((3L, 8L, 6L)))
  }

  test("exact re-post: the whole later document is one span") {
    val t = "x y a b c d e f q r s"
    val out = spans(Seq(1L -> t, 2L -> t))
    assert(!out.contains(1L))
    assert(out(2L) == Seq((1L, 11L, 11L)))
  }

  test("within-document repetition counts: second occurrence in the SAME doc is cut") {
    // "p q r s t" appears at pos 1 and again at pos 7 (gap "u" at 6)
    val out = spans(Seq(1L -> "p q r s t u p q r s t"))
    assert(out(1L) == Seq((7L, 11L, 5L)))
  }

  test("separated duplicated regions stay separate islands") {
    val out = spans(Seq(
      1L -> "a b c d e zz1 zz2 zz3 zz4 v w x y z",
      // duplicates doc 1's prefix (pos 1..5) and suffix (pos 10..14)
      // with different middles — two spans, not one
      2L -> "a b c d e qq1 qq2 qq3 qq4 v w x y z"))
    assert(!out.contains(1L))
    assert(out(2L) == Seq((1L, 5L, 5L), (10L, 14L, 5L)))
  }

  test("docs shorter than the window are ignored; no spans without duplication") {
    val out = spans(Seq(
      1L -> "a b c",
      2L -> "one two three four five six",
      3L -> "seven eight nine ten eleven twelve"))
    assert(out.isEmpty)
  }

  test("substringStrip: cut the span, keep the document") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d e f q r s",          // loses tokens 3..8
      3L -> "x y a b c d e f q r s",          // exact re-post → all cut
      4L -> "one two three four five six")    // untouched
    val out = Dedup.substringStrip(docs.toDF("doc_id", "text"),
        "doc_id", TextOps.tokenize(col("text")), window = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("a b c d e f g h", 0L))
    assert(out(2L) == ("x y q r s", 6L))
    assert(out(3L) == ("", 11L))
    assert(out(4L) == ("one two three four five six", 0L))
  }

  test("incremental: corpus content is always canonical, batch-internal dups keep-first") {
    import spark.implicits._
    val idxPath = java.nio.file.Files
      .createTempDirectory("sub-idx-spec-").toString
    // corpus doc (high id) holds "a b c d e f"
    Dedup.writeSubstringIndex(
      Seq(900L -> "a b c d e f g h").toDF("doc_id", "text"),
      "doc_id", TextOps.tokenize(col("text")), idxPath)
    val batch = Seq(
      // shares the corpus passage — cut even though its id is LOWER
      // than the corpus doc's (d15's id-order canonical would have
      // kept it)
      1L -> "x y a b c d e f q r s",
      // batch-internal pair: keep-first within the batch
      2L -> "p q r s t u v w",
      3L -> "p q r s t u v w").toDF("doc_id", "text")
    val out = Dedup.incrementalSubstringSpans(spark, idxPath, batch,
        "doc_id", TextOps.tokenize(col("text")))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    assert(out(1L) == Seq((3L, 8L, 6L)))
    assert(!out.contains(2L))
    assert(out(3L) == Seq((1L, 8L, 8L)))
  }

  test("incremental with an empty index ≡ substringSpans of the batch") {
    import spark.implicits._
    val idxPath = java.nio.file.Files
      .createTempDirectory("sub-idx-empty-").toString
    Dedup.writeSubstringIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", TextOps.tokenize(col("text")), idxPath)
    val batch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val inc = Dedup.incrementalSubstringSpans(spark, idxPath, batch,
        "doc_id", TextOps.tokenize(col("text")))
      .collect().map(_.toSeq).toSet
    val full = Dedup.substringSpans(batch, "doc_id",
        TextOps.tokenize(col("text")))
      .collect().map(_.toSeq).toSet
    assert(inc == full && inc.nonEmpty)
  }

  /** Independent driver-side reference: same policy, plain Scala
    * collections, no hashing (grouped on raw window content) — any
    * md5-collision or join/window bug in the distributed path would
    * diverge from it.
    */
  private def naiveSpans(docs: Seq[(Long, Seq[String])],
                         w: Int): Set[(Long, Long, Long, Long)] = {
    val occ = for ((id, toks) <- docs if toks.length >= w;
                   p <- 1 to toks.length - w + 1)
      yield (id, p.toLong, toks.slice(p - 1, p - 1 + w).mkString(" "))
    val marked = occ.groupBy(_._3).values.flatMap { os =>
      if (os.size >= 2) {
        val canon = os.map(o => (o._1, o._2)).min
        os.map(o => (o._1, o._2)).filter(_ != canon)
      } else Nil
    }.toSeq
    marked.groupBy(_._1).flatMap { case (id, ps) =>
      val islands = ps.map(_._2).sorted
        .foldLeft(List.empty[List[Long]]) {
          case (Nil, p) => List(List(p))
          case (cur :: rest, p) =>
            if (p <= cur.head + w) (p :: cur) :: rest
            else List(p) :: cur :: rest
        }
      islands.map { isl =>
        val s = isl.min; val e = isl.max + w - 1
        (id, s, e, e - s + 1)
      }
    }.toSet
  }

  test("random corpora match an independent naive reference (tiny vocab forces collisions)") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c")
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 10L).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(18))(vocab(rnd.nextInt(3)))
      }
      val got = Dedup.substringSpans(
          docs.map { case (id, ts) => (id, ts.mkString(" ")) }
            .toDF("doc_id", "text"),
          "doc_id", TextOps.tokenize(col("text")), window = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == naiveSpans(docs, 3), s"seed=$seed")
    }
  }

  test("random corpora: substringStrip matches the naive reference splice") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c")
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val docs = (0L until 10L).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(18))(vocab(rnd.nextInt(3)))
      }
      val got = Dedup.substringStrip(
          docs.map { case (id, ts) => (id, ts.mkString(" ")) }
            .toDF("doc_id", "text"),
          "doc_id", TextOps.tokenize(col("text")), window = 3)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      val spansByDoc = naiveSpans(docs, 3).groupBy(_._1)
      val exp = docs.map { case (id, ts) =>
        val cut = spansByDoc.getOrElse(id, Set.empty)
          .flatMap { case (_, s, e, _) => s to e }
        id -> (ts.zipWithIndex
          .collect { case (t, i) if !cut(i + 1L) => t }
          .mkString(" "), cut.size.toLong)
      }.toMap
      assert(got == exp, s"seed=${100 + seed}")
    }
  }

  // ---- d19: WITHIN-doc repeated-window strip (doc-local, in-row) ----

  test("intraDocStrip: later repeat of a 3-token run is cut, first kept") {
    import spark.implicits._
    val out = Dedup.intraDocStrip(
        Seq(1L -> "a b c x a b c").toDF("doc_id", "text"),
        "doc_id", TextOps.tokenize(col("text")), window = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // window "a b c" repeats at pos 5 → tokens 5..7 cut
    assert(out(1L) == ("a b c x", 3L))
  }

  test("intraDocStrip: overlapping repeats coalesce; short/clean docs pass through") {
    import spark.implicits._
    val out = Dedup.intraDocStrip(Seq(
        1L -> "a b a b a b a b",  // starts 3..6 marked → tokens 3..8 cut
        2L -> "one two three four",
        3L -> "a b").toDF("doc_id", "text"),
        "doc_id", TextOps.tokenize(col("text")), window = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("a b", 6L))
    assert(out(2L) == ("one two three four", 0L))
    assert(out(3L) == ("a b", 0L))
  }

  test("intraDocStrip is doc-local: cross-corpus duplicates are NOT cut") {
    import spark.implicits._
    val t = "p q r s t u v w"
    val out = Dedup.intraDocStrip(
        Seq(1L -> t, 2L -> t).toDF("doc_id", "text"),
        "doc_id", TextOps.tokenize(col("text")), window = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (t, 0L) && out(2L) == (t, 0L))
  }

  /** Independent per-doc reference for intraDocStrip: linear scan with
    * a seen-set over raw window content.
    */
  private def naiveIntra(toks: Seq[String], w: Int): (String, Long) = {
    if (toks.length < w) return (toks.mkString(" "), 0L)
    val seen = scala.collection.mutable.Set.empty[Seq[String]]
    val marked = (1 to toks.length - w + 1).filter { p =>
      val win = toks.slice(p - 1, p - 1 + w)
      if (seen(win)) true else { seen += win; false }
    }
    val cut = marked.flatMap(p => p until p + w).toSet
    (toks.zipWithIndex.collect { case (t, i) if !cut(i + 1) => t }
      .mkString(" "), cut.size.toLong)
  }

  test("intraDocStrip: random docs match the naive seen-set reference") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c")
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(200 + seed)
      val docs = (0L until 12L).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(3)))
      }
      val got = Dedup.intraDocStrip(
          docs.map { case (id, ts) => (id, ts.mkString(" ")) }
            .toDF("doc_id", "text"),
          "doc_id", TextOps.tokenize(col("text")), window = 3)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      val exp = docs.map { case (id, ts) =>
        id -> naiveIntra(ts, 3) }.toMap
      assert(got == exp, s"seed=${200 + seed}")
    }
  }

  test("corpus invariants: spans never overlap, length ≥ window, consistent arithmetic") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.substringSpans(docs, "doc_id",
        TextOps.tokenize(col("text")), window = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty) // the fixtures plant near-dups → spans exist
    out.foreach { case (_, s, e, n) =>
      assert(n == e - s + 1 && n >= 5)
    }
    out.groupBy(_._1).values.foreach { sp =>
      sp.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          // merged islands: a following span starts strictly past the
          // previous one (touching windows would have merged)
          assert(s2 > e1 + 1)
        case _ => ()
      }
    }
  }
}
