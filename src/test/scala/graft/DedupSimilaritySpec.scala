package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}
import graft.text.TextOps

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("exactDedup keeps min-id survivor per content group") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "lazy dog"),
      (3L, "the quick brown fox"), (4L, "lazy dog"), (5L, "unique"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    assert(groups.count() == 3)
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 5L))
  }

  test("jaccardPairs finds a planted near-dup, not unrelated docs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " w40x"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", TextOps.tokenize(col("text")))
    val pairs = Dedup.jaccardPairs(sh, 0.5)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("jaccardPairs maxShingleDf: hot shingle capped, near-dups kept") {
    import spark.implicits._
    // every doc shares one hot shingle ("h1 h2 h3"); docs 1/2 are
    // near-dups through their OWN shingles; capping df>3 must drop the
    // hot shingle from intersections (denominators stay exact) while
    // still finding the planted pair.
    val hot = "h1 h2 h3 "
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " w40x"
    val docs = Seq(
      (1L, hot + base), (2L, hot + nearDup),
      (3L, hot + (100 to 140).map(i => s"v$i").mkString(" ")),
      (4L, hot + (200 to 240).map(i => s"u$i").mkString(" ")),
      (5L, hot + (300 to 340).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", TextOps.tokenize(col("text")))
    val capped = Dedup.jaccardPairs(sh, 0.5, maxShingleDf = Some(3))
      .select("a", "b").as[(Long, Long)].collect().toSeq
    assert(capped == Seq((1L, 2L)))
    // uncapped finds the same pair here (hot shingles only add noise
    // rows to the self-join, not extra qualifying pairs)
    val exact = Dedup.jaccardPairs(sh, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSeq
    assert(exact == Seq((1L, 2L)))
  }

  test("maxShingleDf wins on a hot-shingle skew corpus (volume + wall time)") {
    import spark.implicits._
    // The corpus shape the cap exists for: ONE hot shingle planted in
    // 40% of 5000 SHORT docs (hot df = 2000 → ~2M intersection pairs
    // from that shingle alone, vs only ~55k shingle rows total — the
    // regime where per-pair work dwarfs the cap's two extra passes
    // over |sh|), every other shingle df ≤ 2. Docs 1/2 are true
    // near-dups through their own shingles.
    val n = 5000
    val hot = "hot1 hot2 hot3 "
    def uniq(d: Int) = (1 to 10).map(i => s"d${d}_$i").mkString(" ")
    val rows = Seq(
      (1L, hot + (1 to 10).map(i => s"p$i").mkString(" ")),
      (2L, hot + (1 to 9).map(i => s"p$i").mkString(" ") + " p10x")) ++
      (3 to n).map(d =>
        (d.toLong, (if (d % 10 < 4) hot else "") + uniq(d)))
    val docs = rows.toDF("doc_id", "text").repartition(4)
    val sh = Dedup.shingles(docs, "doc_id", TextOps.tokenize(col("text")))
      .persist()
    try {
      sh.count()
      // warm both plan shapes (codegen + stage setup) on a tiny slice
      // so the timed runs compare steady-state work, not compilation
      val tiny = sh.filter(col("doc_id") < 100).persist()
      tiny.count()
      Dedup.jaccardPairs(tiny, 0.5, Some(100)).count()
      Dedup.jaccardPairs(tiny, 0.5).count()
      tiny.unpersist()
      // deterministic invariant: the cap removes ~all pair volume
      val dfs = sh.groupBy("shingle").count()
      def vol(capped: Boolean) = dfs
        .filter(if (capped) col("count") <= 100 else lit(true))
        .agg(sum(col("count") * (col("count") - 1) / 2)).head.getDouble(0).toLong
      val (volAll, volCap) = (vol(false), vol(true))
      assert(volAll > 1000L * volCap,
        s"fixture not skewed enough: uncapped=$volAll capped=$volCap")

      // capped runs FIRST (absorbs any residual warmup — conservative)
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      var capRes: Seq[(Long, Long)] = null
      var allRes: Seq[(Long, Long)] = null
      val tCap = time { capRes = Dedup.jaccardPairs(sh, 0.5, Some(100))
        .select("a", "b").as[(Long, Long)].collect().toSeq.sorted }
      val tAll = time { allRes = Dedup.jaccardPairs(sh, 0.5)
        .select("a", "b").as[(Long, Long)].collect().toSeq.sorted }
      // both find exactly the planted pair; the hot shingle's 1.1M
      // pairs all score 1/81 < 0.5
      assert(capRes == Seq((1L, 2L)) && allRes == Seq((1L, 2L)))
      // The deterministic gate is the >1000x pair-volume assertion
      // above; wall-clock comparison is info-only because relative
      // timings of two tiny jobs can invert on a loaded CI machine.
      info(f"skew fixture: capped $tCap%.2fs vs uncapped $tAll%.2fs " +
        f"(pair volume $volCap vs $volAll)")
    } finally sh.unpersist()
  }

  test("prefixFilterPairs ≡ jaccardPairs on random corpora (lossless)") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d")
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(500 + seed)
      val docs = (0L until 25L).map { id =>
        id -> Seq.fill(4 + rnd.nextInt(14))(vocab(rnd.nextInt(4)))
          .mkString(" ")
      }.toDF("doc_id", "text")
      val sh = Dedup.shingles(docs, "doc_id", TextOps.tokenize(col("text")))
      val exact = Dedup.jaccardPairs(sh, 0.5)
        .select($"a", $"b", $"jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val pf = Dedup.prefixFilterPairs(sh, 0.5)
        .select($"a", $"b", $"jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(pf == exact, s"seed=${500 + seed}")
    }
  }

  test("PPJoin positional filter prunes a late-shared-prefix candidate " +
      "before the array verify") {
    import spark.implicits._
    // Planted: docs 1 and 2 (n=4 each) share ONLY 'bb', which sits at
    // 0-based position 2 in both rarest-first arrays ([a1,aa,bb,cc] /
    // [b1,aa2,bb,cc2] — df-1 singletons first, then df-2 in name
    // order). 'bb' is inside both prefixes (len 3), so (1,2) IS a
    // candidate; the positional bound min(4-2, 4-2) = 2 cannot reach
    // the t/(1+t)·(na+nb) = 8/3 overlap a J ≥ 0.5 pair needs, so the
    // filter must drop it without shipping either shingle array.
    val sh = (Seq("a1", "aa", "bb", "cc").map(1L -> _) ++
      Seq("b1", "aa2", "bb", "cc2").map(2L -> _) ++
      (Seq("aa", "cc", "aa2", "cc2") ++
        (1 to 6).map(i => s"c$i")).map(3L -> _))
      .toDF("doc_id", "shingle")
    val st = Dedup.prefixFilterStages(sh, 0.5)
    assert(st.cands.select($"a", $"b").as[(Long, Long)].collect()
      .toSeq == Seq((1L, 2L)))
    assert(st.survivors.count() == 0)
    assert(st.result.count() == 0)
    st.docSets.unpersist()
  }

  test("prefix filtering self-defuses the hot shingle: full exact result, " +
      "no cap, prefix-candidate volume stays tiny") {
    import spark.implicits._
    // the same corpus shape that forces jaccardPairs' lossy
    // maxShingleDf cap: one shingle in 40% of docs
    val n = 2000
    val hot = "hot1 hot2 hot3 "
    def uniq(d: Int) = (1 to 10).map(i => s"d${d}_$i").mkString(" ")
    val rows = Seq(
      (1L, hot + (1 to 10).map(i => s"p$i").mkString(" ")),
      (2L, hot + (1 to 9).map(i => s"p$i").mkString(" ") + " p10x")) ++
      (3 to n).map(d =>
        (d.toLong, (if (d % 10 < 4) hot else "") + uniq(d)))
    val sh = Dedup.shingles(rows.toDF("doc_id", "text"),
      "doc_id", TextOps.tokenize(col("text"))).persist()
    try {
      // UNCAPPED and exact — finds precisely the planted pair
      val got = Dedup.prefixFilterPairs(sh, 0.5)
        .select($"a", $"b").as[(Long, Long)].collect().toSeq.sorted
      assert(got == Seq((1L, 2L)))
      // the defusing mechanism, asserted structurally: rarest-first
      // prefixes of the short docs exclude the hot shingles (df ~800
      // sorts after every df≤2 shingle, and each 11-13-token doc's
      // prefix keeps only ~half its ~10 shingles), so the hot
      // shingle's prefix df — the pair-emission driver — collapses
      // from ~800 to ~2 and its quadratic term vanishes
      val dfTab = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
      val prefixDf = sh.join(dfTab, "shingle")
        .groupBy($"doc_id")
        .agg(sort_array(collect_list(struct($"df", $"shingle"))).as("ss"))
        .select(explode(slice($"ss", lit(1),
          (size($"ss") - ceil(lit(0.5) * size($"ss")) + 1).cast("int")))
          .as("p"))
        .select($"p.shingle")
        .groupBy($"shingle").agg(count(lit(1)).as("pdf"))
      val hotPrefixDf = prefixDf
        .filter($"shingle".startsWith("hot"))
        .agg(coalesce(max($"pdf"), lit(0L))).head.getLong(0)
      assert(hotPrefixDf <= 4,
        s"hot shingle still drives prefix candidates: pdf=$hotPrefixDf")
    } finally sh.unpersist()
  }

  test("minhashLshPairs recovers the same planted pair") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " w40x"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", TextOps.tokenize(col("text")))
    val pairs = Dedup.minhashLshPairs(sh).select("a", "b")
      .as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("minhash LSH agrees with exact jaccard on the sf0.001 corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = Dedup.shingles(docs, "doc_id", TextOps.tokenize(col("text")))
    val exact = Dedup.jaccardPairs(sh, 0.5).select("a", "b").collect().toSet
    val lsh = Dedup.minhashLshPairs(sh, threshold = 0.5)
      .select("a", "b").collect().toSet
    // at jaccard≈0.98 and 4 bands of 4, P(miss) ≈ 0 — expect identity
    assert(lsh == exact)
    assert(exact.nonEmpty)
    // xxhash64 production profile: verification is exact Jaccard, so
    // false positives are impossible; recall on near-threshold pairs
    // is band-collision luck in EITHER profile. On this corpus the
    // 31-word vocabulary gives a tiny shared shingle pool, so one
    // globally low-hashing shingle correlates misses across pairs —
    // assert bounded recall here, and perfect recall on the
    // statistically-clean planted fixture below.
    val fast = Dedup.minhashLshPairsFast(sh, threshold = 0.5)
      .select("a", "b").collect().toSet
    val high = Dedup.jaccardPairs(sh, 0.5)
      .filter(col("jaccard") >= 0.9).select("a", "b").collect().toSet
    assert(fast.subsetOf(exact), s"false positives: ${fast.diff(exact)}")
    assert(high.nonEmpty)
    val recall = high.count(fast).toDouble / high.size
    info(f"fast-profile recall on j>=0.9 corpus pairs: $recall%.3f")
    assert(recall >= 0.9, s"fast profile recall $recall on high-j pairs")
  }

  test("fast-profile LSH: full recall on planted pairs with distinct shingle pools") {
    import spark.implicits._
    // 100 planted near-dup pairs, each with its OWN 40-shingle pool
    // (j = 39/41 ≈ 0.95 ⇒ per-pair detection ~0.999 at 4x4 bands) —
    // the clean-statistics complement to the shared-pool corpus test.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).flatMap { p =>
      val base = (0 until 40).map(i => s"w${p}_$i")
      val swapAt = rnd.nextInt(40)
      val mod = base.updated(swapAt, s"x$p")
      base.map((2L * p, _)) ++ mod.map((2L * p + 1, _))
    }
    val sh = rows.toDF("doc_id", "shingle")
    val found = Dedup.minhashLshPairsFast(sh, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val wanted = (0 until 100).map(p => (2L * p, 2L * p + 1)).toSet
    // per-pair detection ~0.999 ⇒ a miss is a ~1-in-1000 Bernoulli
    // tail per pair (deterministic given the seed; this draw has 1);
    // the claim under test is statistical recall, not perfection
    val recall = wanted.count(found).toDouble / wanted.size
    info(f"planted-fixture recall: $recall%.2f")
    assert(recall >= 0.95, s"recall $recall; missed ${wanted.diff(found)}")
    assert(found.filterNot(wanted).isEmpty, "false positives on fixture")
  }

  test("simhash: identical docs get identical fingerprints; near-dups close") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"w$i").mkString(" ") + " x y"
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val df = Seq(base, base, nearDup, other).toDF("text")
      .select(Dedup.tokenHashes(TextOps.tokenize(col("text"))).as("hvs"))
      .select(Dedup.simhashFromHashes(col("hvs")).as("fp"))
    val fps = df.as[Long].collect()
    assert(fps(0) == fps(1))
    assert(java.lang.Long.bitCount(fps(0) ^ fps(2)) <= 10)
    assert(java.lang.Long.bitCount(fps(0) ^ fps(3)) > 10)
  }

  test("brute-force knn: top-1 of a vector's own duplicate is itself") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val knn = Similarity.bruteForceKnn(vecs, vecs.filter($"vec_id" === 0), 2)
    val rows = knn.orderBy("rn").select("n_id").as[Long].collect()
    assert(rows.head == 1L)
  }

  test("lsh knn recall ≥ 0.9 vs brute force on sf0.001 embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceKnn(emb, q, 10)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshKnn(emb, q, 10)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    // These embeddings are unstructured (top-10 neighbors out at
    // θ ≈ 69°) — the hardest case for angular LSH. The 16-table ×
    // 4-plane OR-construction still must clear 0.9.
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("minhashLshPairsDocs ≡ minhashLshPairs (zero-shuffle form) on " +
      "the sf0.001 corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = graft.text.TextOps.tokenize(col("text"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))
    }.toSet
    val fromSh = key(Dedup.minhashLshPairs(
      Dedup.shingles(docs, "doc_id", toks)))
    val fromDocs = key(Dedup.minhashLshPairsDocs(docs, "doc_id", toks))
    assert(fromDocs == fromSh,
      s"diverge: ${(fromDocs diff fromSh).take(3)} / " +
        s"${(fromSh diff fromDocs).take(3)}")
    assert(fromSh.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("FNV in-row band kernel ≡ lshBandSignaturesFast aggregation; " +
      "minhashLshPairsFastDocs and the sets index path ≡ the exploded " +
      "forms on the sf0.001 corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = graft.text.TextOps.tokenize(col("text"))
    val sh = Dedup.shingles(docs, "doc_id", toks)
    val sets = Dedup.shingleSets(docs, "doc_id", toks)
    // band-level parity
    val aggBands = Dedup.lshBandSignaturesFast(sh, 16, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val rowBands = sets.select(col("doc_id"),
        explode(Dedup.bandSignaturesInRowFast(col("shset"), 16, 4))
          .as("bs"))
      .select(col("doc_id"), col("bs.b"), col("bs.sig"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rowBands == aggBands,
      s"band diverge: ${(rowBands diff aggBands).take(3)}")
    // pair-level parity, both the one-shot and the persisted path
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))
    }.toSet
    assert(key(Dedup.minhashLshPairsFastDocs(docs, "doc_id", toks)) ==
      key(Dedup.minhashLshPairsFast(sh)))
    val p1 = java.nio.file.Files
      .createTempDirectory("graft-idx-parity-sh-").toString
    val p2 = java.nio.file.Files
      .createTempDirectory("graft-idx-parity-sets-").toString
    Dedup.writeNearDupIndex(sh.filter(col("doc_id") >= 100), p1)
    Dedup.writeNearDupIndexSets(sets.filter(col("doc_id") >= 100), p2)
    val viaSh = key(Dedup.incrementalNearDups(spark, p1,
      sh.filter(col("doc_id") < 100), threshold = 0.5))
    val viaSets = key(Dedup.incrementalNearDupsSets(spark, p2,
      sets.filter(col("doc_id") < 100), threshold = 0.5))
    assert(viaSets == viaSh,
      s"incremental diverge: ${(viaSets diff viaSh).take(3)}")
  }

  test("sortedNeighborhoodPairsSets ≡ sortedNeighborhoodPairs on the " +
      "sf0.001 corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = graft.text.TextOps.tokenize(col("text"))
    val sortKey = substring(translate(col("text"), " ", ""), 1, 16)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))
    }.toSet
    val exploded = key(Dedup.sortedNeighborhoodPairs(docs, "doc_id",
      sortKey, toks, window = 10, threshold = 0.5))
    val viaSets = key(Dedup.sortedNeighborhoodPairsSets(docs, "doc_id",
      sortKey, toks, window = 10, threshold = 0.5))
    assert(viaSets == exploded,
      s"diverge: ${(viaSets diff exploded).take(3)} / " +
        s"${(exploded diff viaSets).take(3)}")
  }

  test("lshKnn in-row ≡ lshKnnJoined (ids, bit-identical cosines, " +
      "rank order) on sf0.001 embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        r.getInt(3))
    }.toSet
    val inRow = key(Similarity.lshKnn(emb, q, 10))
    val joined = key(Similarity.lshKnnJoined(emb, q, 10))
    assert(inRow == joined,
      s"in-row vs joined diverge: ${(inRow diff joined).take(3)} / " +
        s"${(joined diff inRow).take(3)}")
  }

  test("simhash multi-band is exhaustive for Hamming distance ≤ 3") {
    import spark.implicits._
    // 26 docs: perturbations of a 60-token base + unrelated noise.
    // Ground truth = exact all-pairs Hamming over collected
    // fingerprints; the banded operator must return exactly the
    // dist ≤ 3 subset (pigeonhole: 4 bands, ≤3 flips).
    val base = (1 to 60).map(i => s"w$i")
    val docs = (0 until 20).map { v =>
      (v.toLong, base.updated(v % 60, s"x$v").mkString(" "))
    } ++ Seq((100L, base.mkString(" ")), (101L, base.mkString(" "))) ++
      (0 until 4).map(v =>
        (200L + v, (1 to 60).map(i => s"z${v}_$i").mkString(" ")))
    val df = docs.toDF("doc_id", "text")

    val fps = df.select(col("doc_id"),
        Dedup.simhash(TextOps.tokenize(col("text"))).as("fp"))
      .as[(Long, Long)].collect().toMap
    val expected = (for {
      a <- fps.keys; b <- fps.keys if a < b
      if java.lang.Long.bitCount(fps(a) ^ fps(b)) <= 3
    } yield (a, b)).toSet

    val got = Dedup.simhashPairs(df, "doc_id",
        TextOps.tokenize(col("text")), maxDist = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    assert(expected.contains((100L, 101L))) // identical pair present
  }

  test("ivf knn: recall rises with nProbe; ≥0.8 at nProbe=8/16") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceKnn(emb, q, 10)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val ivf = Similarity.ivfKnn(emb, q, 10, numCells = 16,
          nProbe = nProbe)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & ivf).size.toDouble / brute.size
    }
    val r4 = recallAt(4); val r8 = recallAt(8)
    // unstructured embeddings are IVF's worst case (no cluster
    // structure): measured 0.67 @ 4 probes, 0.85 @ 8. Monotonicity +
    // the 8-probe floor are the invariants worth pinning.
    assert(r8 >= r4, s"recall not monotone: $r4 → $r8")
    assert(r8 >= 0.8, s"recall@8=$r8")
  }

  test("quantizeInt8: codes bounded, reconstruction within maxAbs/254, " +
      "zero vector safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(3.0f, 2.0f, -3.0f, 0.1f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = df.select($"vec_id", $"embedding",
        Similarity.quantizeInt8($"embedding").as("qz"))
      .select($"vec_id", $"embedding", $"qz.scale", $"qz.q")
      .collect()
    for (r <- rows) {
      val vec = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val q = r.getSeq[Int](3)
      val maxAbs = vec.map(x => math.abs(x.toDouble)).max
      if (maxAbs == 0) {
        assert(scale == 0.0 && q.forall(_ == 0))
      } else {
        assert(q.forall(c => c >= -127 && c <= 127))
        assert(q.exists(c => math.abs(c) == 127)) // max dim saturates
        vec.zip(q).foreach { case (x, c) =>
          assert(math.abs(x - c / scale) <= maxAbs / 254 + 1e-12,
            s"dim error too large for x=$x c=$c scale=$scale")
        }
      }
    }
  }

  test("contaminationBloom ≡ contamination on the sf0.001 corpus, " +
      "including at bloom sizes that force false positives") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = TextOps.tokenize(col("text"))
    val corpusSh = Dedup.shingles(docs.filter(col("doc_id") >= 20),
      "doc_id", toks)
    val evalSh = Dedup.shingles(docs.filter(col("doc_id") < 20),
      "doc_id", toks)
    val exact = Dedup.contamination(corpusSh, evalSh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // generous sizing AND a deliberately undersized filter (64 bits
    // for thousands of shingles → false positives on most rows): the
    // confirm join must erase the difference either way
    for ((items, bits) <- Seq((1L << 16, 1L << 20), (8L, 64L))) {
      val bloom = Dedup
        .contaminationBloom(corpusSh, evalSh, items, bits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bloom == exact, s"items=$items bits=$bits diverged")
    }
  }

  test("dup clusters: components, min-id labels, multi-round chains") {
    import spark.implicits._
    // triangle {1,2,3}, edge {10,11}, cycle {20,21,22}, and a 9-hop
    // path 100–109 (pair list only has consecutive links) — the chain
    // forces ≥5 propagation rounds, not a single-join fixpoint.
    val pairs = (Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)) ++
      (100L until 109L).map(i => (i, i + 1))).toDF("a", "b")
    val got = Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val expected =
      Seq(1L, 2L, 3L).map(_ -> 1L) ++ Seq(10L, 11L).map(_ -> 10L) ++
        Seq(20L, 21L, 22L).map(_ -> 20L) ++
        (100L to 109L).map(_ -> 100L)
    assert(got == expected.toMap)
  }

  test("cosine dup pairs: LSH recall vs exact on the sf0.001 slice") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 500)
    val exact = Similarity.cosineDupPairsExact(emb, 0.4)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineDupPairs(emb, 0.4)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // no false positives possible (candidates are exactly verified)
    assert((lsh -- exact).isEmpty)
    // pairs at cos 0.4 sit at θ≈66° — recall formula gives ~0.87 for
    // 12 tables × 4 planes; near-dup corpora (cos ≥ 0.9) would be ~1.
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.75, s"recall=$recall")
  }

  test("PQ: codes bounded; training beats seeded codebooks; ADC ranks") {
    import org.apache.spark.sql.functions.{avg, posexplode}
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 500)
    val seeded = Similarity.seededCodebooks(4, 16, 16)
    val trained = Similarity.pqTrain(emb, numSub = 4, k = 16, dim = 64)

    // codes live in [0, K)
    val codeRange = emb.select(posexplode(
        Similarity.pqEncode(col("embedding"), seeded)))
      .agg(org.apache.spark.sql.functions.min(col("col")),
        org.apache.spark.sql.functions.max(col("col"))).head()
    assert(codeRange.getInt(0) >= 0 && codeRange.getInt(1) < 16)

    // mean squared reconstruction error: k-means codebooks must beat
    // random gaussian ones on the same data by a wide margin
    def mse(cbs: Similarity.Codebooks): Double =
      emb.select(Similarity.dot(
          org.apache.spark.sql.functions.zip_with(
            col("embedding").cast("array<double>"),
            Similarity.pqDecode(
              Similarity.pqEncode(col("embedding"), cbs), cbs),
            (x, y) => x - y),
          org.apache.spark.sql.functions.zip_with(
            col("embedding").cast("array<double>"),
            Similarity.pqDecode(
              Similarity.pqEncode(col("embedding"), cbs), cbs),
            (x, y) => x - y)).as("se"))
        .agg(avg(col("se"))).head().getDouble(0)
    val (mseTrained, mseSeeded) = (mse(trained), mse(seeded))
    assert(mseTrained < mseSeeded / 2,
      s"trained $mseTrained vs seeded $mseSeeded")

    // ADC top-10 vs exact L2 top-10 (ADC approximates L2, so the
    // baseline is L2, not cosine). Unstructured embeddings are PQ's
    // worst case, so the claims are the ones that must hold anywhere:
    // recall rises with code granularity (M=4 → M=16 measured
    // 0.06 → 0.21 here) and the fine profile clears a floor.
    import org.apache.spark.sql.functions.{broadcast, row_number, zip_with}
    val queries = emb.filter(col("vec_id") < 10)
    val c = emb.select(col("vec_id").as("n_id"),
      col("embedding").cast("array<double>").as("n_vec"))
    val qv = broadcast(queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("q_vec")))
    val diff = zip_with(col("q_vec"), col("n_vec"), (x, y) => x - y)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2").asc, col("n_id").asc)
    val exact = c.join(qv, col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        Similarity.dot(diff, diff).as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(cbs: Similarity.Codebooks): Double = {
      val adc = Similarity.pqAdcTopK(emb, queries, cbs, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.keys.map(q =>
        (adc.getOrElse(q, Set.empty) & exact(q)).size.toDouble / 10)
        .sum / exact.size
    }
    val coarse = recallOf(trained)
    val fine = recallOf(
      Similarity.pqTrain(emb, numSub = 16, k = 16, dim = 64))
    assert(fine > coarse,
      s"recall must rise with M: coarse=$coarse fine=$fine")
    assert(fine >= 0.15, s"fine-profile ADC recall@10=$fine")
  }

  test("semDedup: no false pairs; trained cells keep most exact pairs") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 500)
    val exact = Similarity.cosineDupPairsExact(emb, 0.4)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // trained path: k-means cells + cell-local pairs → clusters
    val clusters = Similarity.semDedup(emb, numCells = 4,
      threshold = 0.4)
    val labels = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every exact pair that semDedup recovered shares a cluster label;
    // recall loss is only cell-boundary straddling, quantified here.
    // These embeddings are unstructured (near-worst case for a coarse
    // quantizer), so the bar is deliberately modest; clustered real
    // corpora sit near 1.0.
    val kept = exact.count { case (a, b) =>
      labels.get(a).exists(la => labels.get(b).contains(la))
    }
    val recall = kept.toDouble / exact.size
    assert(recall >= 0.25, s"semantic recall=$recall")
    // and the pair stage itself admits no below-threshold pair
    val pairs = Similarity.semDedupPairs(emb,
      Similarity.randomPlanes(8, 64, seed = 7L), 0.4)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((pairs -- exact).isEmpty, "cell-local stage invented a pair")
  }

  test("embedDecontaminate: planted near-copy of an eval vector is " +
      "dropped, orthogonal survivors keep full rows, eval broadcasts") {
    import spark.implicits._
    val ev = Array.fill(8)(0.5f)
    val nearCopy = ev.map(x => x + 0.01f)        // cos ≈ 1 → condemned
    val orth = Array.tabulate(8)(i =>            // alternating ±: cos 0
      if (i % 2 == 0) 0.5f else -0.5f)
    val evalDf = Seq((0L, ev, 9)).toDF("vec_id", "embedding", "label")
    val corpus = Seq(
      (100L, nearCopy, 1), (101L, orth, 2), (102L, orth.map(-_), 3)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.embedDecontaminate(corpus, evalDf, 0.4)
    assert(out.select("vec_id").as[Long].collect().toSet ==
      Set(101L, 102L))
    // survivors keep their full original rows
    assert(out.columns.toSeq == corpus.columns.toSeq)
    // scale shape: both eval-side joins are broadcast — the corpus is
    // never shuffled
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for a benchmark-sized eval set:\n$plan")
  }

  test("mmrRerank: diversity beats pure relevance on a planted near-dup pair") {
    import spark.implicits._
    // query along x; candidates: two near-identical high-relevance
    // vectors (ids 10, 11), one diverse mid-relevance vector (id 12):
    // s(11) = .5·0.9940 − .5·0.99995 < 0 < s(12) = .5·0.8944 − .5·0.8900
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f)), // the query itself, excluded by KNN
      (10L, Array(1f, 0.1f, 0f)),
      (11L, Array(1f, 0.11f, 0f)),
      (12L, Array(1f, 0f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(corpus,
        corpus.filter($"vec_id" === 0), candK = 3, selK = 2,
        lambda = 0.5)
      .orderBy("sel_rank")
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    // pure top-2 would be (10, 11); MMR keeps 10 then jumps to the
    // diverse 12 because 11 is ~identical to the already-selected 10
    assert(out.toSeq == Seq((1, 10L), (2, 12L)))
  }

  /** Driver-side naive MMR on cosine doubles — same λ, tie-break and
    * float op order as the operator. */
  private def naiveMmr(qv: Array[Float], cands: Seq[(Long, Array[Float])],
                       candK: Int, selK: Int,
                       lam: Double): Seq[(Int, Long)] = {
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
    def nrm(a: Array[Float]): Double = math.sqrt(
      a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (nrm(a) * nrm(b))
    val scored = cands.map { case (id, v) => (id, v, cos(qv, v)) }
      .sortBy { case (id, _, c) => (-c, id) }.take(candK)
    val om = 1.0 - lam
    val sel = scala.collection.mutable.ArrayBuffer(
      scored.maxBy { case (id, _, c) => (c, -id) })
    while (sel.size < selK) {
      val rest = scored.filterNot(c => sel.exists(_._1 == c._1))
      sel += rest.maxBy { case (id, v, c) =>
        (lam * c - om * sel.map(s => cos(v, s._2)).max, -id) }
    }
    sel.toSeq.zipWithIndex.map { case ((id, _, _), i) => (i + 1, id) }
  }

  test("mmrRerank matches the naive greedy reference on random vectors") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(300 + seed)
      val vecs = (0L until 30L).map(i =>
        (i, Array.fill(6)(rnd.nextGaussian().toFloat)))
      val qv = vecs.head._2
      val got = Similarity.mmrRerank(vecs.toDF("vec_id", "embedding"),
          vecs.toDF("vec_id", "embedding").filter($"vec_id" === 0),
          candK = 8, selK = 4, lambda = 0.7)
        .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq.sorted
      val exp = naiveMmr(qv, vecs.tail, 8, 4, 0.7).sorted
      assert(got == exp, s"seed=${300 + seed}")
    }
  }

  test("clusterBalancedSample: quota bound, cluster coverage, and " +
      "agreement with the window-sort reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // 3 planted clusters of very different sizes around orthogonal-ish
    // centers — the skew a per-corpus sample would mirror and a
    // per-cluster quota must flatten
    val centers = Seq(
      Array.fill(8)(0.0).updated(0, 10.0),
      Array.fill(8)(0.0).updated(3, -10.0),
      Array.fill(8)(0.0).updated(6, 10.0))
    val sizes = Seq(60, 25, 5)
    val vecs = centers.zip(sizes).zipWithIndex.flatMap {
      case ((c, n), ci) => (0 until n).map { j =>
        val id = ci * 1000L + j
        (id, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
      }
    }
    val df = vecs.toDF("vec_id", "embedding")
    val ctrs = centers.map(_.map(identity)).toArray
    val quota = 10
    val got = Similarity.clusterBalancedSample(df, ctrs, quota)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // quota respected per cell; the 5-row cluster keeps all 5
    val byCell = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byCell == Map(0 -> quota, 1 -> quota, 2 -> 5))
    // ranks are 1..n_kept per cell and follow priority order
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rows.length))
      assert(sorted.map(_._3).toSeq ==
        sorted.map(_._3).sortBy(identity).toSeq)
    }
    // agreement with the window-sort reference over the same
    // assignment + priority columns (the heap must pick exactly the
    // quota lowest priorities, ties to smaller id)
    val ref = df.select(
        element_at(Similarity.nearestCells($"embedding", ctrs, 1), 1)
          .as("cell"),
        $"vec_id",
        conv(substring(md5(concat($"vec_id".cast("string"),
          lit("|e22"))), 1, 13), 16, 10).cast("long").as("priority"))
      .withColumn("pick_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"cell").orderBy($"priority", $"vec_id")))
      .filter($"pick_rank" <= quota)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got.toSet == ref)
  }

  test("exactJaccardPairsAuto: emission on benign df, prefix under skew, " +
      "identical relation either way") {
    import spark.implicits._
    def dfTab(sh: org.apache.spark.sql.DataFrame) =
      sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
    def rel(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select($"a", $"b", $"jaccard")
        .as[(Long, Long, Double)].collect().toSet

    // benign random corpus (the parity-test generator): candidate
    // volume per occurrence sits around 1-2 — decision says emission
    val vocab = Vector("a", "b", "c", "d")
    val rnd = new scala.util.Random(761)
    val benign = (0L until 25L).map { id =>
      id -> Seq.fill(4 + rnd.nextInt(14))(vocab(rnd.nextInt(4)))
        .mkString(" ")
    }.toDF("doc_id", "text")
    val shB = Dedup.shingles(benign, "doc_id", TextOps.tokenize($"text"))
    assert(Dedup.emissionWins(dfTab(shB), 16.0),
      "benign corpus must pick the emission path")
    assert(rel(Dedup.exactJaccardPairsAuto(shB, 0.5)) ==
      rel(Dedup.prefixFilterPairs(shB, 0.5)))

    // hot-shingle skew (the self-defusing-prefix fixture at n=4000:
    // one shingle in ~40% of docs → Σ df·(df−1)/2 ≈ 1.3M over ~44k
    // occurrences, an order of magnitude past the budget) — decision
    // says prefix filtering, result is exactly the planted pair
    val n = 4000
    val hot = "hot1 hot2 hot3 "
    def uniq(d: Int) = (1 to 10).map(i => s"d${d}_$i").mkString(" ")
    val rows = Seq(
      (1L, hot + (1 to 10).map(i => s"p$i").mkString(" ")),
      (2L, hot + (1 to 9).map(i => s"p$i").mkString(" ") + " p10x")) ++
      (3 to n).map(d =>
        (d.toLong, (if (d % 10 < 4) hot else "") + uniq(d)))
    val shS = Dedup.shingles(rows.toDF("doc_id", "text"),
      "doc_id", TextOps.tokenize($"text")).persist()
    try {
      assert(!Dedup.emissionWins(dfTab(shS), 16.0),
        "skewed corpus must pick the prefix path")
      val got = Dedup.exactJaccardPairsAuto(shS, 0.5)
        .select($"a", $"b").as[(Long, Long)].collect().toSeq.sorted
      assert(got == Seq((1L, 2L)))
    } finally shS.unpersist()
  }
}
