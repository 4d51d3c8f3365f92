package graft.tools

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.operators.Dedup
import graft.text.TextOps

/** Interleaved A/B for d20's pipeline media: shingles as STRINGS with
  * size(array_intersect) verify (the pre-hash form, reproduced here
  * verbatim from git as the probe twin) vs the committed
  * xxhash64-i64 + IntersectCountI64 form. Same corpus, same session,
  * alternating rounds; both emit the identical pair relation (row
  * counts printed as the in-run check).
  *
  * Round-9 results (SCALE.md coda 6): sf0.1 — str 40.9/11.9/7.9 s vs
  * i64 13.1/3.7/3.9 s, identical 256-row output every round; at
  * pseudo-sf1 the str twin never completed (>8 min, GC-bound in the
  * verify spill — the coda-4 allocation cliff at a scale the kernel
  * form clears in 7.2 s warm), so the sf1/sf10 comparison uses
  * dedicated TimeQuery runs of the committed form instead.
  */
object PrefixAbProbe {

  def prefixFilterPairsStr(sh: DataFrame, threshold: Double)
      : (DataFrame, DataFrame) = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val dfTab = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // per-doc shingle array in rarest-first (df, shingle) order — the
    // prefix reads the order, the verify reads the set; persisted
    // because three consumers would otherwise re-run the df join +
    // doc aggregation over the corpus
    val docSets = sh.join(dfTab, "shingle")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
        .as("ss"))
      .select(col("doc_id"),
        transform(col("ss"), p => p("shingle")).as("shset"))
      .persist()
    // prefix occurrences carry their 0-based position in the
    // rarest-first array AND the doc's set size: both ride the
    // per-shingle shuffle as two ints so the candidate filters below
    // need NO join against a corpus-sized `sizes` table (the original
    // form shuffled the full candidate set twice just to learn na/nb)
    val prefixes = docSets
      .select(col("doc_id"), size(col("shset")).as("n"),
        posexplode(slice(col("shset"), lit(1),
          (size(col("shset")) -
            ceil(lit(threshold) * size(col("shset"))) + 1).cast("int")))
          .as(Seq("pos", "shingle")))
    // chained-generator pair emission over each prefix shingle's
    // sorted (doc, pos, n) list; one aggregate folds the per-shared-
    // shingle duplicates (the old `.distinct()`) AND computes the
    // first-shared-element positions: positions within each doc are
    // monotone in the global (df, shingle) order, so min(pa) and
    // min(pb) over shared prefix shingles are attained at the SAME
    // (globally rarest) shared element.
    val cands = prefixes.groupBy(col("shingle"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("pos"), col("n")))).as("ds"))
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "pa")))
      .select(col("pa"),
        explode(slice(col("ds"), col("i") + lit(2), size(col("ds"))))
          .as("pb"))
      .groupBy(col("pa.doc_id").as("a"), col("pb.doc_id").as("b"))
      .agg(min(col("pa.pos")).as("ia"), min(col("pb.pos")).as("jb"),
        max(col("pa.n")).as("na"), max(col("pb.n")).as("nb"))
    // Arasu length filter (J ≥ t ⇒ t·max ≤ min) + PPJoin positional
    // filter (Xiao et al. 2008 Lemma 2): no shared element precedes
    // the first shared one in either array, so
    // overlap ≤ min(na − ia, nb − jb) (0-based), and J ≥ t needs
    // overlap ≥ t/(1+t)·(na+nb).
    val survivors = cands
      .filter(lit(threshold) * greatest(col("na"), col("nb")) <=
        least(col("na"), col("nb")))
      .filter((lit(1.0) + lit(threshold)) *
        least(col("na") - col("ia"), col("nb") - col("jb")) >=
        lit(threshold) * (col("na") + col("nb")))
      .select(col("a"), col("b"))
    val sa = docSets.select(col("doc_id").as("a"), col("shset").as("__sa"))
    val sb = docSets.select(col("doc_id").as("b"), col("shset").as("__sb"))
    val result = survivors.join(sa, Seq("a")).join(sb, Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("__sa"), col("__sb"))).as("__i"),
        size(col("__sa")).as("__na"), size(col("__sb")).as("__nb"))
      .select(col("a"), col("b"),
        (col("__i").cast("double") /
          (col("__na") + col("__nb") - col("__i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    (docSets, result)
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-d20-ab", "32")
    val d = args.headOption.getOrElse("/root/repo/target/sf1")
    val docs = Tables.documents(spark, d)
    val toks = TextOps.tokenize(TextOps.clean(col("text")))
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
    (1 to 3).foreach { i =>
      time(s"d20-str#$i") {
        val (ds, res) = prefixFilterPairsStr(sh, 0.5)
        val n = res.count(); ds.unpersist(blocking = true); n
      }
      time(s"d20-i64#$i")(Dedup.prefixFilterPairs(sh, 0.5).count())
    }
    spark.stop()
  }
}
