package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.operators.Dedup
import graft.text.TextOps

/** Interleaved A/B for d20's PAIR-EMISSION stage (round 11): the
  * pre-round-11 `posexplode(ds)` + `explode(slice(ds, i+2, m))`
  * shape (reproduced verbatim here as the probe twin — it copies the
  * struct tail of the per-shingle doc list for every outer element,
  * Σ(m−i) ≈ m²/2 struct copies per group) vs the committed
  * `sequence` + `element_at` shape (index arrays only, elements
  * probed in place). Same corpus, same session, alternating rounds;
  * both emit the identical pair relation (row counts printed as the
  * in-run check). Everything else — xxhash64 i64 shingles,
  * IntersectCountI64 verify, all three lossless prunes — is
  * identical between twins.
  */
object PairEmitAbProbe {

  /** prefixFilterStages with the pre-round-11 slice-copy emission;
    * kept verbatim so the A/B isolates exactly one variable. */
  def prefixFilterPairsSlice(shStr: DataFrame, threshold: Double)
      : (DataFrame, DataFrame) = {
    import graft.operators.Dedup.intersectCountI64
    val sh = shStr.select(col("doc_id"),
      xxhash64(col("shingle")).as("shingle"))
    val dfTab = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val docSets = sh.join(dfTab, "shingle")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
        .as("ss"))
      .select(col("doc_id"),
        transform(col("ss"), p => p("shingle")).as("shset"))
      .persist()
    val prefixes = docSets
      .select(col("doc_id"), size(col("shset")).as("n"),
        posexplode(slice(col("shset"), lit(1),
          (size(col("shset")) -
            ceil(lit(threshold) * size(col("shset"))) + 1).cast("int")))
          .as(Seq("pos", "shingle")))
    val cands = prefixes.groupBy(col("shingle"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("pos"), col("n")))).as("ds"))
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "pa")))
      .select(col("pa"),
        explode(slice(col("ds"), col("i") + lit(2), size(col("ds"))))
          .as("pb"))
      .groupBy(col("pa.doc_id").as("a"), col("pb.doc_id").as("b"))
      .agg(min(col("pa.pos")).as("ia"), min(col("pb.pos")).as("jb"),
        max(col("pa.pos")).as("la"), max(col("pb.pos")).as("lb"),
        count(lit(1)).as("alpha"),
        max(col("pa.n")).as("na"), max(col("pb.n")).as("nb"))
    val survivors = cands
      .filter(lit(threshold) * greatest(col("na"), col("nb")) <=
        least(col("na"), col("nb")))
      .filter((lit(1.0) + lit(threshold)) *
        least(col("na") - col("ia"), col("nb") - col("jb")) >=
        lit(threshold) * (col("na") + col("nb")))
      .filter((lit(1.0) + lit(threshold)) *
        (col("alpha") +
          least(col("na") - lit(1) - col("la"),
            col("nb") - lit(1) - col("lb"))) >=
        lit(threshold) * (col("na") + col("nb")))
      .select(col("a"), col("b"))
    val sa = docSets.select(col("doc_id").as("a"), col("shset").as("__sa"))
    val sb = docSets.select(col("doc_id").as("b"), col("shset").as("__sb"))
    val result = survivors.join(sa, Seq("a")).join(sb, Seq("b"))
      .select(col("a"), col("b"),
        intersectCountI64(col("__sa"), col("__sb")).as("__i"),
        size(col("__sa")).as("__na"), size(col("__sb")).as("__nb"))
      .select(col("a"), col("b"),
        (col("__i").cast("double") /
          (col("__na") + col("__nb") - col("__i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    (docSets, result)
  }

  /** 2nd arg: an int = interleaved same-JVM rounds (A/B ratio mode);
    * "slice1" / "seq1" = run ONE twin ONCE and exit — the cold-forked
    * per-twin mode (fork a fresh JVM per invocation, take medians;
    * the shared-JVM interleaved mode self-degrades at pseudo-sf10
    * exactly like the SCALE.md same-JVM-rerun pathology). */
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-d20-pair-ab", "32")
    val d = args.headOption.getOrElse("/root/repo/target/sf1")
    val mode = args.drop(1).headOption.getOrElse("3")
    val reps = if (mode.forall(_.isDigit)) mode.toInt else 1
    val docs = Tables.documents(spark, d)
    // RAW tokens, exactly like the registered d20 face (DedupQueries
    // docTokens). NOT TextOps.clean first: clean strips [^a-zA-Z],
    // which deletes the pseudo-scale fixture's `_r<replica>` token
    // suffixes — cross-replica shingles then collide and the corpus
    // grows the quadratic cross-replica near-dup pair bomb the
    // fixture is engineered to prevent (make_scale_fixture.py header;
    // measured: the cleaned-token probe OOMs a 100 GB heap at
    // pseudo-sf1 where the registered face runs in seconds). Round
    // 9's PrefixAbProbe carries the same cleaned-token corpus — its
    // sf1 "str twin never completed" datapoint is contaminated by
    // this, not purely by allocation (SCALE.md round-11 coda).
    val toks = TextOps.tokenize(col("text"))
    def sh = Dedup.shingles(docs, "doc_id", toks)
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.sparkContext.getPersistentRDDs.foreach {
        case (_, r) => r.unpersist(blocking = true)
      }
    }
    mode match {
      case "slice1" =>
        time("d20-slice-cold") {
          val (ds, res) = prefixFilterPairsSlice(sh, 0.5)
          val n = res.count(); ds.unpersist(blocking = true); n
        }
      case "seq1" =>
        time("d20-seq-cold")(Dedup.prefixFilterPairs(sh, 0.5).count())
      case _ =>
        (1 to reps).foreach { i =>
          time(s"d20-slice#$i") {
            val (ds, res) = prefixFilterPairsSlice(sh, 0.5)
            val n = res.count(); ds.unpersist(blocking = true); n
          }
          time(s"d20-seq#$i")(Dedup.prefixFilterPairs(sh, 0.5).count())
        }
    }
    spark.stop()
  }
}
