package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.text.{Lemmatizer, TextOps}

/** Property-based invariants (SURVEY.md §5 test plan): tokenizer
  * algebra on arbitrary generated input and lemmatizer idempotence.
  * Uses ScalaCheck generators with explicit sampling (the
  * scalatest-scalacheck bridge isn't on the test classpath); Column
  * -function properties evaluate in one batched DataFrame pass per
  * property, not one Spark job per sample.
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 500)(f: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(f)
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("lemma is idempotent unless a detachment strands an s-final " +
      "stem (the no-lexicon morphy gap, pinned below)") {
    // WordNet morphy applies ONE detachment and accepts it only if
    // the lexicon contains the stem; without a lexicon the cascade
    // re-detaches stems that still end in s (found by this generator
    // in round 11: "…nses" → "…ns" → "…n"). So the true contract is:
    // idempotent whenever the first result doesn't end in a bare s;
    // otherwise a second pass strips at most one more suffix.
    forAll(wordGen) { w =>
      val once = Lemmatizer.lemma(w)
      if (!once.endsWith("s"))
        assert(Lemmatizer.lemma(once) == once, s"w=$w once=$once")
      else {
        // s-final results may re-detach, but the cascade must
        // STABILIZE (reach a fixpoint within |once| further passes)
        // and every step must be one of morphy's own moves — a 1-2
        // char suffix detachment, ies→y, or an irregular-map hop
        // (axes→axis class) — never arbitrary mangling
        val orbit = Iterator.iterate(once)(Lemmatizer.lemma)
          .take(once.length + 2).toVector
        val fix = orbit.sliding(2).indexWhere(p => p(0) == p(1))
        assert(fix >= 0, s"w=$w cascade never stabilizes: $orbit")
        orbit.take(fix + 1).sliding(2).foreach {
          case Vector(a, b) =>
            val detachment =
              b == a.dropRight(1) || b == a.dropRight(2) ||
                (a.endsWith("ies") && b == a.dropRight(3) + "y")
            val irregularHop =
              (a.endsWith("es") && b == a.dropRight(2) + "is") ||
                (a.endsWith("ves") && (b == a.dropRight(3) + "f" ||
                  b == a.dropRight(3) + "fe")) ||
                (a.endsWith("ices") && (b == a.dropRight(4) + "ex" ||
                  b == a.dropRight(3) + "x"))
            // only s-final intermediates may keep detaching; non-s
            // intermediates change only via the irregular map
            assert(detachment || irregularHop || !a.endsWith("s"),
              s"w=$w non-morphy step $a -> $b in $orbit")
          case _ => ()
        }
      }
    }
    // the gap, pinned concrete: ses-detachment stranding an s-stem
    assert(Lemmatizer.lemma("tenses") == "tens")
    assert(Lemmatizer.lemma("tens") == "ten")
    // and the protected neighbours that DO stay fixed
    assert(Lemmatizer.lemma(Lemmatizer.lemma("lenses")) == "lens")
    assert(Lemmatizer.lemma(Lemmatizer.lemma("senses")) == "sense")
  }

  test("lemma never lengthens a word and keeps short words intact") {
    forAll(wordGen) { w =>
      val l = Lemmatizer.lemma(w)
      assert(l.length <= w.length + 2, s"w=$w l=$l") // ies→y +...
      if (w.length < 3) assert(l == w || Lemmatizer.lemma(w) != w &&
        TextOpsFixtures.irregularish(w), s"short $w → $l")
    }
  }

  val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.alphaChar,
    2 -> Gen.const(' '),
    1 -> Gen.oneOf('0', '9', '#', '@', '!', '.', ',', ':', '/',
      'é', 'ß', '\n', '\t'),
    1 -> Gen.const("http://x.co/y z").map(_.head) // degenerate
  )).map(_.mkString)

  test("clean is idempotent and emits only [a-z ] (batched)") {
    import spark.implicits._
    val samples = Gen.listOfN(300, textGen).sample.get
    val df = samples.toDF("text")
      .select(TextOps.clean(col("text")).as("c1"))
      .withColumn("c2", TextOps.clean(col("c1")))
    val rows = df.as[(String, String)].collect()
    rows.foreach { case (c1, c2) =>
      assert(c1 == c2, s"not idempotent: '$c1' vs '$c2'")
      assert(c1.forall(ch => ch == ' ' || (ch >= 'a' && ch <= 'z')),
        s"illegal chars in '$c1'")
      assert(!c1.startsWith(" "), s"lstrip violated: '$c1'")
    }
  }

  test("tokenize emits only nonempty lowercase-letter tokens (batched)") {
    import spark.implicits._
    val samples = Gen.listOfN(300, textGen).sample.get
    val toks = samples.toDF("text")
      .select(TextOps.tokenize(TextOps.clean(col("text"))).as("t"))
      .as[Seq[String]].collect()
    toks.flatten.foreach { t =>
      assert(t.nonEmpty && t.forall(ch => ch >= 'a' && ch <= 'z'),
        s"bad token '$t'")
    }
  }

  // Randomized equivalence for the two-level bucketed operators: the
  // bucketed plan must equal the naive single-window semantics on
  // arbitrary (ids, groups, costs) inputs — skewed groups, singleton
  // groups, costs larger than the budget, all bucket counts.
  test("tokenBudgetCap ≡ naive window on random inputs (batched)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    import graft.operators.Splits
    val rowsGen = Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 300L)
      g <- Gen.oneOf("a", "b", "c", "skew", "skew", "skew")
      cost <- Gen.choose(1L, 120L)
    } yield (id, g, cost)).map(_.distinctBy(_._1))
    forAll(Gen.zip(rowsGen, Gen.oneOf(1, 4, 64)), n = 12) {
      case (rows, buckets) =>
        val df = rows.toDF("id", "g", "cost")
        val w = W.partitionBy($"g").orderBy($"__rk", $"id")
          .rowsBetween(W.unboundedPreceding, -1)
        val expected = df
          .withColumn("__rk", Splits.hash60($"id", "p"))
          .withColumn("__cum", coalesce(sum($"cost").over(w), lit(0L)))
          .filter($"__cum" < 100L).select($"id", $"g", $"cost")
          .as[(Long, String, Long)].collect().toSet
        val got = Splits
          .tokenBudgetCap(df, "id", "g", "cost", "p", 100L, buckets)
          .as[(Long, String, Long)].collect().toSet
        assert(got == expected,
          s"buckets=$buckets rows=${rows.size} diverged")
    }
  }

  // Degenerate cost shapes the precondition doc calls out: zero-cost
  // rows (the running sum stalls, so a zero-cost tail past the
  // boundary stays kept — same as the exact window), single costs
  // larger than the whole budget (the group's highest-priority row is
  // still kept: its strict-prefix sum is 0 < budget), and buckets=1
  // (the entire group lands in one boundary bucket, all-cost-in-one-
  // bucket by construction).
  test("tokenBudgetCap ≡ naive window on adversarial cost shapes") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    import graft.operators.Splits
    val rowsGen = Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 400L)
      g <- Gen.oneOf("one", "one", "one", "two")
      cost <- Gen.frequency(
        3 -> Gen.const(0L),
        3 -> Gen.choose(1L, 9L),
        2 -> Gen.choose(50L, 5000L))
    } yield (id, g, cost)).map(_.distinctBy(_._1))
    val caseGen = Gen.zip(rowsGen, Gen.oneOf(1, 2, 64),
      Gen.oneOf(1L, 7L, 40L))
    forAll(caseGen, n = 12) { case (rows, buckets, budget) =>
      val df = rows.toDF("id", "g", "cost")
      val w = W.partitionBy($"g").orderBy($"__rk", $"id")
        .rowsBetween(W.unboundedPreceding, -1)
      val ranked = df.withColumn("__rk", Splits.hash60($"id", "p"))
      val expected = ranked
        .withColumn("__cum", coalesce(sum($"cost").over(w), lit(0L)))
        .filter($"__cum" < budget).select($"id", $"g", $"cost")
        .as[(Long, String, Long)].collect().toSet
      val got = Splits
        .tokenBudgetCap(df, "id", "g", "cost", "p", budget, buckets)
        .as[(Long, String, Long)].collect().toSet
      assert(got == expected,
        s"buckets=$buckets budget=$budget rows=${rows.size} diverged")
      // the highest-priority row of every group survives any budget
      val firstPerGroup = ranked.as[(Long, String, Long, Long)].collect()
        .groupBy(_._2).values.map(_.minBy(r => (r._4, r._1)))
        .map(r => (r._1, r._2, r._3)).toSet
      assert(firstPerGroup.subsetOf(got),
        s"dropped a group's first row: ${firstPerGroup.diff(got)}")
    }
  }

  test("shuffleRank ≡ naive global window on random inputs (batched)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    import graft.operators.Splits
    val idsGen = Gen.nonEmptyListOf(Gen.choose(0L, 5000L)).map(_.distinct)
    forAll(Gen.zip(idsGen, Gen.oneOf(1, 16, 1024)), n = 12) {
      case (ids, buckets) =>
        val df = ids.toDF("id")
        val expected = df
          .withColumn("__rk", Splits.hash60($"id", "p"))
          .withColumn("pos",
            row_number().over(W.orderBy($"__rk", $"id")).cast("long") - 1L)
          .select($"id", $"pos").as[(Long, Long)].collect().toMap
        val got = Splits.shuffleRank(df, "id", "p", buckets)
          .as[(Long, Long)].collect().toMap
        assert(got == expected, s"buckets=$buckets n=${ids.size} diverged")
    }
  }

  test("containment dominates jaccard and is bounded by 1 on random corpora") {
    import spark.implicits._
    // containment(a→b) = i/|S(a)| ≥ i/(|S(a)|+|S(b)|−i) = jaccard —
    // every Jaccard pair must reappear in the directed containment
    // list (both directions) at the same threshold, never scored
    // above 1.
    val docGen = Gen.listOfN(12,
      Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.mkString(" "))
    forAll(Gen.listOfN(12, docGen), n = 5) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val sh = graft.operators.Dedup.shingles(docs, "doc_id",
        TextOps.tokenize(col("text")))
      val thr = 0.3
      val jac = graft.operators.Dedup.jaccardPairs(sh, thr)
        .select($"a", $"b").as[(Long, Long)].collect().toSet
      val cont = graft.operators.Dedup.containmentPairs(sh, thr)
        .as[(Long, Long, Double)].collect()
      assert(cont.forall(_._3 <= 1.0 + 1e-12))
      val contSet = cont.map(c => (c._1, c._2)).toSet
      jac.foreach { case (a, b) =>
        assert(contSet.contains((a, b)) && contSet.contains((b, a)),
          s"jaccard pair ($a,$b) missing from containment at thr=$thr")
      }
    }
  }

  test("scd2 ≡ naive per-key interval chain on random change logs") {
    import spark.implicits._
    val logGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 5L)
      ts <- Gen.choose(0L, 40L)
    } yield (k, ts)).map(_.distinct) // unique (key, ts): the contract
    forAll(logGen, n = 8) { entries =>
      val df = entries.map { case (k, ts) => (k, s"v$k-$ts", ts) }
        .toDF("id", "v", "ts")
      val got = graft.operators.Curation.scd2(df, "id", "ts")
        .select($"id", $"ts", $"valid_from", $"valid_to", $"is_current")
        .as[(Long, Long, Long, Option[Long], Boolean)]
        .collect().toSet
      val exp = entries.groupBy(_._1).flatMap { case (k, es) =>
        val sorted = es.map(_._2).distinct.sorted
        sorted.zip(sorted.drop(1).map(Option(_)) :+ None).map {
          case (ts, next) => (k, ts, ts, next, next.isEmpty)
        }
      }.toSet
      assert(got == exp, s"log=$entries")
    }
  }

  test("temperatureMix: kept set ⊆ input, rate-1 groups keep all, " +
      "supersets of a group never change its keep decision") {
    import spark.implicits._
    val gen = for {
      nBig <- Gen.choose(30, 120)
      nSmall <- Gen.choose(1, 15)
    } yield (nBig, nSmall)
    forAll(gen, n = 5) { case (nBig, nSmall) =>
      val rows = ((0L until nBig.toLong).map((_, "big")) ++
        (1000L until 1000L + nSmall).map((_, "small"))).toDF("id", "g")
      val kept = graft.operators.Splits
        .temperatureMix(rows, "id", "g", "p-salt", 4.0)
        .select($"id").as[Long].collect().toSet
      // scale 4 ⇒ any group with ≤16 rows has rate 1: all kept
      assert((1000L until 1000L + nSmall).forall(kept.contains))
      // per-row decision depends only on (group, id, group count):
      // re-running on the same data yields the identical set
      val again = graft.operators.Splits
        .temperatureMix(rows, "id", "g", "p-salt", 4.0)
        .select($"id").as[Long].collect().toSet
      assert(again == kept)
    }
  }

  test("snapshotDiff: random epochs match a naive set diff exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, md5}
    val gen = Gen.choose(1L, Long.MaxValue)
    forAll(gen, n = 6) { seed =>
      val rnd = new scala.util.Random(seed)
      val ids = (0L until 40L)
      val prevIds = ids.filter(_ => rnd.nextDouble() < 0.8).toSet
      val curIds = ids.filter(_ => rnd.nextDouble() < 0.8).toSet
      val changedIds = ids.filter(_ => rnd.nextDouble() < 0.3).toSet
      def text(i: Long, cur: Boolean) =
        if (cur && changedIds(i)) s"doc $i v2" else s"doc $i v1"
      val prev = prevIds.toSeq.map(i => (i, text(i, cur = false)))
        .toDF("id", "t").select($"id", md5($"t").as("fp"))
      val cur = curIds.toSeq.map(i => (i, text(i, cur = true)))
        .toDF("id", "t").select($"id", md5($"t").as("fp"))
      val got = graft.operators.Curation.snapshotDiff(prev, cur, "id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val exp = (
        (curIds -- prevIds).map(_ -> "added") ++
        (prevIds -- curIds).map(_ -> "removed") ++
        (prevIds & curIds).filter(changedIds).map(_ -> "changed")).toMap
      assert(got == exp, s"seed=$seed")
    }
  }

  test("stratifiedExact ≡ naive per-stratum window; exactly " +
      "min(n, |stratum|) rows per stratum on random inputs") {
    import spark.implicits._
    import graft.operators.Splits
    val strat = Gen.oneOf("web", "wiki", "code", "book")
    (1 to 3).foreach { round =>
      val rnd = new scala.util.Random(4200 + round)
      val rows = (0L until 120L).map(id =>
        (id, Iterator.continually(strat.sample).flatten.next()))
      val df = rows.toDF("doc_id", "source")
      val n = 1 + rnd.nextInt(25)
      val got = Splits.stratifiedExact(df, "doc_id", "source",
          "graft-split", n)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSet
      // naive driver reference: same 52-bit md5 priority, per-stratum
      // sort by (priority, id), take n
      def md5hex(s: String): String = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        d.map("%02x".format(_)).mkString
      }
      val exp = rows.groupBy(_._2).flatMap { case (src, members) =>
        members.map { case (id, _) =>
          val pr = java.lang.Long.parseLong(
            md5hex(s"$src:$id|graft-split").take(13), 16)
          (src, id, pr)
        }.sortBy { case (_, id, pr) => (pr, id) }
          .take(n).zipWithIndex
          .map { case ((src2, id, _), i) => (src2, id, i + 1) }
      }.toSet
      assert(got == exp, s"round=$round n=$n " +
        s"missing=${exp -- got} extra=${got -- exp}")
      val perStratum = got.groupBy(_._1).view.mapValues(_.size).toMap
      val sizes = rows.groupBy(_._2).view.mapValues(_.size).toMap
      sizes.foreach { case (src, sz) =>
        assert(perStratum.getOrElse(src, 0) == math.min(n, sz),
          s"round=$round src=$src")
      }
    }
  }

  test("contrastiveNegatives: k per anchor, never the anchor's label, " +
      "deterministic, heap plan (no per-anchor window)") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(40, 120)
      labels <- Gen.choose(3, 6)
    } yield (n, labels)
    forAll(gen, n = 5) { case (n, labels) =>
      val rows = (0L until n.toLong).map(i => (i, (i % labels).toInt))
        .toDF("vec_id", "label")
      val anchors = rows.filter($"vec_id" < 8)
      val df = graft.operators.Splits
        .contrastiveNegatives(rows, anchors, k = 4)
      val out = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      val labelOf = (0L until n.toLong).map(i => i -> (i % labels).toInt).toMap
      out.foreach { case (q, nid, _) =>
        assert(labelOf(nid) != labelOf(q),
          s"negative $nid shares anchor $q's label") }
      out.groupBy(_._1).foreach { case (q, rs) =>
        assert(rs.length == 4 && rs.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4),
          s"anchor $q ranks") }
      val again = graft.operators.Splits
        .contrastiveNegatives(rows, anchors, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      assert(again.sorted.toSeq == out.sorted.toSeq)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_topk") && !plan.contains("Window"),
        s"negatives must fold into the bounded heap, not a window:\n$plan")
    }
  }

  test("bigramScored ≡ naive driver bigram LM on random corpora") {
    import spark.implicits._
    // small vocab so counts collide and the top-V cut + OOV floor
    // both exercise; naive reference recomputes fit and score from
    // scratch on the driver
    val word = Gen.oneOf((0 until 40).map(i => f"w$i%02d"))
    val doc = Gen.chooseNum(0, 8)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    (1 to 4).foreach { round =>
      val texts = Iterator.continually(doc.sample).flatten
        .take(60).toVector
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val got = graft.queries.TextQueries
        .bigramScored(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
        .toMap
      // naive reference
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
      val grams = toks.map { case (id, ws) =>
        id -> ws.sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toVector }
        .filter(_._2.nonEmpty)
      val counts = grams.flatMap(_._2)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = counts.values.sum.toDouble
      val ctx = counts.toSeq
        .groupBy(_._1.split(" ")(0)).view
        .mapValues(_.map(_._2).sum.toDouble).toMap
      val model = counts.toSeq
        .sortBy { case (g, c) => (-c, g) }.take(30)
        .map { case (g, c) =>
          g -> math.log(c / ctx(g.split(" ")(0))) }.toMap
      val floor = math.log(0.5 / total)
      // reference left unrounded; the Spark side rounds to 6 decimals,
      // so agreement within half an ulp-of-rounding is the bound
      val exp = grams.map { case (id, gs) =>
        id -> ((gs.length,
          gs.map(g => model.getOrElse(g, floor)).sum / gs.length))
      }.toMap
      assert(got.keySet == exp.keySet, s"round=$round")
      exp.foreach { case (id, (n, lp)) =>
        assert(got(id)._1 == n, s"round=$round id=$id n")
        assert(math.abs(got(id)._2 - lp) < 1e-6,
          s"round=$round id=$id lp got=${got(id)._2} exp=$lp")
      }
    }
  }

  test("bigramScoredKn ≡ naive driver interpolated-KN LM on random " +
      "corpora (fixed discount D=0.75)") {
    import spark.implicits._
    val word = Gen.oneOf((0 until 40).map(i => f"w$i%02d"))
    val doc = Gen.chooseNum(0, 8)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val D = 0.75
    (1 to 4).foreach { round =>
      val texts = Iterator.continually(doc.sample).flatten
        .take(60).toVector
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val got = graft.queries.TextQueries
        .bigramScoredKn(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
        .toMap
      // naive reference: the textbook interpolated-KN formula,
      // computed from scratch on the driver
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
      val grams = toks.map { case (id, ws) =>
        id -> ws.sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toVector }
        .filter(_._2.nonEmpty)
      val counts = grams.flatMap(_._2)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = counts.values.sum.toDouble
      val types = counts.size.toDouble
      val byW1 = counts.toSeq.groupBy(_._1.split(" ")(0))
      val ccnt = byW1.view.mapValues(_.map(_._2).sum.toDouble).toMap
      val n1fw = byW1.view.mapValues(_.size.toDouble).toMap
      val n1bw = counts.toSeq.groupBy(_._1.split(" ")(1)).view
        .mapValues(_.size.toDouble).toMap
      val model = counts.toSeq
        .sortBy { case (g, c) => (-c, g) }.take(30)
        .map { case (g, c) =>
          val Array(w1, w2) = g.split(" ")
          g -> math.log(
            (math.max(c - D, 0.0) + (D * n1fw(w1)) * (n1bw(w2) / types))
              / ccnt(w1))
        }.toMap
      val floor = math.log(0.5 / total)
      val exp = grams.map { case (id, gs) =>
        id -> ((gs.length,
          gs.map(g => model.getOrElse(g, floor)).sum / gs.length))
      }.toMap
      assert(got.keySet == exp.keySet, s"round=$round")
      exp.foreach { case (id, (n, lp)) =>
        assert(got(id)._1 == n, s"round=$round id=$id n")
        assert(math.abs(got(id)._2 - lp) < 1e-6,
          s"round=$round id=$id lp got=${got(id)._2} exp=$lp")
      }
      // smoothing sanity: every KN log-prob is finite and ≤ 0 (a
      // probability — the interpolation term keeps it strictly
      // positive even at c−D ≈ 0), and for a bigram whose w2 is a
      // RARE continuation (n1fw·n1bw < T) the discount strictly
      // lowers it below MLE — the mass moved toward promiscuous
      // continuations, which is the point of KN
      model.foreach { case (g, lp) =>
        assert(lp <= 0.0 && !lp.isNegInfinity && !lp.isNaN,
          s"round=$round g=$g kn=$lp")
        val Array(w1, w2) = g.split(" ")
        if (n1fw(w1) * n1bw(w2) < types) {
          val mle = math.log(counts(g) / ccnt(w1))
          assert(lp < mle, s"round=$round g=$g kn=$lp mle=$mle")
        }
      }
    }
  }

  test("prioritySample ≡ naive q=w/u top-k; w_hat=max(w,tau); " +
      "HT sum is scale-plausible") {
    import spark.implicits._
    import graft.operators.Splits
    (1 to 3).foreach { round =>
      val rnd = new scala.util.Random(5200 + round)
      val n = 150 + rnd.nextInt(100)
      val k = 10 + rnd.nextInt(30)
      val rows = (0L until n.toLong).map(id => (id, 1 + rnd.nextInt(5000)))
      val df = rows.toDF("doc_id", "wt")
      val got = Splits.prioritySample(df, "doc_id", $"wt", "graft-split", k)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      // naive driver reference: identical arithmetic sequence
      def md5hex(s: String): String = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        d.map("%02x".format(_)).mkString
      }
      val prio = rows.map { case (id, w) =>
        val h = java.lang.Long.parseLong(
          md5hex(s"$id|graft-split").take(13), 16)
        val u = (h.toDouble + 1.0) / 4503599627370496.0
        (id, w.toDouble, w.toDouble / u)
      }.sortBy { case (id, _, q) => (-q, id) }
      val tau = prio(k)._3
      val exp = prio.take(k).filter(_._3 > tau)
        .map { case (id, w, _) => (id, w, math.max(w, tau)) }
        .sortBy(_._1)
      assert(got.toSeq == exp.toSeq, s"round=$round k=$k")
      assert(got.length == k, s"round=$round k=$k got=${got.length}")
      // Horvitz–Thompson sanity: each w_hat ≥ its w, and the HT total
      // lands within 4x of the true total on these benign weights
      // (unbiasedness is an expectation; this is a plausibility rail)
      val total = rows.map(_._2.toDouble).sum
      val ht = got.map(_._3).sum
      assert(got.forall { case (_, w, wh) => wh >= w })
      assert(ht > total / 4 && ht < total * 4,
        s"round=$round ht=$ht total=$total")
    }
  }
}

private object TextOpsFixtures {
  /** Short words the irregular map intentionally rewrites. */
  def irregularish(w: String): Boolean = Set("as", "is", "us").contains(w)
}
