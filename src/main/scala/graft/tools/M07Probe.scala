package graft.tools

/** Round-15 m07 in-pass slowdown probe. The driver's 32-core bench
  * showed m07 at 31 s vs 7.5 s at 8 cores and ~9 s isolated — the
  * 300-iteration GD loop pays a per-iteration fixed cost that only
  * appears (a) in a long-lived session and (b) at high core counts.
  * This reproduces both axes in one JVM: run m07 fresh, then run a
  * block of heavy predecessor queries (the bench's session state),
  * then m07 again — with SPARK_GRAFT_GD_DEBUG phase accounting inside
  * GradientDescent attributing the loop time to broadcast create /
  * job / destroy / driver update / GC / JIT.
  *
  * Usage: runMain graft.tools.M07Probe [nPred]
  *   SPARK_GRAFT_CPUS controls the core count, as everywhere.
  */
object M07Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val nPred = args.headOption.map(_.toInt).getOrElse(12)
    val spark = graft.core.Sessions.local("graft-m07-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
    val sc = spark.sparkContext
    def timed[A](tag: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime(); val a = f
      println(f"[m07-probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    try graft.core.Tables.lineitem(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"[warmup] $e") }
    try graft.queries.MlQueries.warmFeaturized(spark)
    catch { case e: Throwable => System.err.println(s"[warmup] $e") }
    val keepIds = sc.getPersistentRDDs.keySet
    def sweep(): Unit = sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!keepIds.contains(id)) rdd.unpersist(blocking = true)
    }
    def runQ(name: String): Unit = {
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
      catch { case e: Throwable =>
        System.err.println(s"[m07-probe] $name FAILED: ${e.getMessage}") }
      sweep()
    }
    timed("m07 fresh")(runQ("m07_rdd_lr_train"))
    timed("m07 fresh2")(runQ("m07_rdd_lr_train"))
    // heavy predecessors: the big spark.ml fits, the dedup pair
    // pipelines, the sketch scans — the session state a shuffled
    // bench pass accumulates before m07's slot
    val preds = Seq("m06_ml_gbt", "m05_ml_randforest", "m03_ml_linearsvc",
      "d20_prefix_filter_pairs", "q17_approx_stats", "q23_exact_percentiles",
      "t22_bigram_kn", "d16_substring_strip", "q16_json_props",
      "ly02_zorder_scan", "e16_ivf_persisted", "d14_split_leakage")
      .take(nPred)
    timed(s"${preds.size} predecessors")(preds.foreach(runQ))
    timed("m07 after-pred")(runQ("m07_rdd_lr_train"))
    timed("m07 after-pred2")(runQ("m07_rdd_lr_train"))
    spark.stop()
  }
}
