package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 deliverable: before/after `explain("formatted")` plans for
  * every query the optimization round touched, written to plans/r14/.
  *
  * "Before" plans are generated from the SAME code by forcing the
  * pre-round path (localFinishEdges/localFinishVocab = 0 reproduces
  * the distributed loops that were previously unconditional); for the
  * imperative RDD trainers (m07/m08/m04) the "plan" is the job
  * structure, recorded as a header note plus the final face plan.
  *
  * Usage: runMain graft.tools.R14PlanDump [sfDir]
  */
object R14PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-r14-plans", "*")
    val dir = Paths.get("plans", "r14")
    Files.createDirectories(dir)

    def write(name: String, note: String, df: => DataFrame): Unit = {
      val d = df
      // materialize so the AQE final plan is what gets printed
      d.collect()
      val plan = d.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val formatted = d.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(dir.resolve(s"$name.txt"),
        (s"# $name\n# $note\n\n== explain(\"formatted\") ==\n" +
          formatted + "\n== final executed plan (post-AQE) ==\n" +
          plan + "\n").getBytes("UTF-8"))
      // free anything the query pinned
      spark.sparkContext.getPersistentRDDs.foreach {
        case (_, rdd) => rdd.unpersist(blocking = true)
      }
      println(s"[r14-plans] wrote $name")
    }

    val docs = graft.core.Tables.documents(spark, sfDir)
    def docTokens = graft.text.TextOps.tokenize(
      graft.text.TextOps.clean(col("text")))
    def pairs = graft.operators.Dedup.minhashLshPairsDocs(
      docs, "doc_id", docTokens, n = 3, numHashes = 16,
      rowsPerBand = 4, threshold = 0.5)

    // d06 — label propagation: distributed rounds (before) vs bounded
    // driver union-find over the materialized pair list (after)
    write("d06_dup_clusters_before",
      "forced distributed label propagation (localFinishEdges = 0) — " +
        "the unconditional pre-round path: 2 shuffles + an action per " +
        "round over the checkpointed edge list",
      graft.operators.Dedup.dupClusters(pairs, localFinishEdges = 0L))
    write("d06_dup_clusters_after",
      "default bounded local finish: pair pipeline materialized once " +
        "(persist + count), union-find on the driver, result is a " +
        "local relation",
      graft.operators.Dedup.dupClusters(pairs))

    // d18 — integer Q40 power iteration: 2 shuffles x 5 rounds in one
    // plan (before) vs driver recurrence over the collected edges
    write("d18_dup_centrality_before",
      "forced distributed power iteration (localFinishEdges = 0) — " +
        "5 rounds x (edges-join + dst-keyed agg) in one plan over the " +
        "checkpointed symmetric edge list",
      graft.operators.Dedup.centralityFixedPoint(pairs, iters = 5,
        localFinishEdges = 0L))
    write("d18_dup_centrality_after",
      "default bounded local finish: edge list checkpointed + counted " +
        "once, Q40 integer recurrence on the driver (bit-identical), " +
        "result is a local relation",
      graft.operators.Dedup.centralityFixedPoint(pairs, iters = 5))

    // d10 — resolveClusters over d06's clusters: the cluster relation
    // is now a local relation, so both joins broadcast
    def quality = docs.select(col("doc_id"),
      size(docTokens).cast("bigint").as("quality"))
    write("d10_dedup_resolve_before",
      "resolveClusters over forced-distributed dupClusters output " +
        "(checkpoint-backed cluster relation)",
      graft.operators.Dedup.resolveClusters(
        graft.operators.Dedup.dupClusters(pairs, localFinishEdges = 0L),
        quality))
    write("d10_dedup_resolve_after",
      "resolveClusters over the local-finish cluster relation — " +
        "cluster side is a broadcast local relation",
      graft.operators.Dedup.resolveClusters(
        graft.operators.Dedup.dupClusters(pairs), quality))

    // e09 — semdedup closes cell-local cosine pairs with dupClusters
    def embPairs = {
      val emb = graft.core.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 500)
      graft.operators.Similarity.semDedupPairs(emb,
        graft.operators.Similarity.randomPlanes(8, 64, seed = 7L),
        threshold = 0.4).select(col("a"), col("b"))
    }
    write("e09_semdedup_before",
      "dupClusters forced distributed (localFinishEdges = 0)",
      graft.operators.Dedup.dupClusters(embPairs, localFinishEdges = 0L)
        .select(col("doc_id").as("vec_id"), col("cluster_id")))
    write("e09_semdedup_after",
      "default bounded local finish",
      graft.operators.Dedup.dupClusters(embPairs)
        .select(col("doc_id").as("vec_id"), col("cluster_id")))

    // bpe01 — merge training: the per-round pair-count plan (before)
    // vs the one-shuffle vocab + driver loop (after). The BEFORE file
    // records round 1's argmax plan, the per-round unit cost.
    {
      val v = graft.operators.Bpe.vocab(docs, docTokens).localCheckpoint()
      write("bpe01_train_merges_before",
        "ROUND-1 UNIT of the forced-distributed trainer " +
          "(localFinishVocab = 0): one pair-count shuffle + 1-row " +
          "argmax per merge round (x12 rounds, each with a fresh " +
          "codegen'd replace-chain plan)",
        v.select(col("freq"),
            explode(graft.operators.Ngrams.ngramsInRow(
              graft.operators.Bpe.symbols(col("marked")), 2)).as("gram"))
          .select(col("freq"),
            split(col("gram"), " ").getItem(0).as("lhs"),
            split(col("gram"), " ").getItem(1).as("rhs"))
          .groupBy(col("lhs"), col("rhs"))
          .agg(sum(col("freq")).as("pf"))
          .orderBy(col("pf").desc, col("lhs").asc, col("rhs").asc)
          .limit(1))
      graft.core.Checkpoints.release(v)
    }
    write("bpe01_train_merges_after",
      "default bounded local finish: the face's full output — one " +
        "vocab shuffle (inside trainMerges) then a driver merge loop; " +
        "the returned rule table is a local relation",
      graft.SparkEntry.queries("bpe01_train_merges")(spark, sfDir))

    // m04 — imperative spark.ml fit; record the face's returned row
    // plan plus the job-structure note
    write("m04_ml_dectree_after",
      "IMPERATIVE TRAINER — the change is the fit input: " +
        "training.repartition(8) (deterministic round-robin of the " +
        "same rows; bit-identical model per tools.TreeParProbe), so " +
        "the tree aggregation runs 8-way instead of single-task. The " +
        "returned row is a local relation either way; before/after " +
        "evidence is the probe output in OPTIMIZATION_r14.md",
      graft.SparkEntry.queries("m04_ml_dectree")(spark, sfDir))

    // m07/m08 — imperative RDD trainers; the plan-level change is the
    // per-iteration job shape (closure size, input cache form,
    // concurrency), recorded in OPTIMIZATION_r14.md with probe data
    write("m07_rdd_lr_train_after",
      "IMPERATIVE TRAINER — 300 iteration-jobs now read an " +
        "object-cached RDD[SparseDoc] (no per-pass InternalRow " +
        "decode); gradient buffers allocated inside mapPartitions " +
        "instead of a dim-sized zero in every task closure. Returned " +
        "row is a local relation; evidence in OPTIMIZATION_r14.md",
      graft.SparkEntry.queries("m07_rdd_lr_train")(spark, sfDir))
    write("m08_rdd_nn_train_after",
      "IMPERATIVE TRAINER — same treatment as m07 plus the two " +
        "independent trainings (SGD, Adam) overlapped from two " +
        "driver threads (guide §2.6). Returned rows are a local " +
        "relation; evidence in OPTIMIZATION_r14.md",
      graft.SparkEntry.queries("m08_rdd_nn_train")(spark, sfDir))

    spark.stop()
  }
}
