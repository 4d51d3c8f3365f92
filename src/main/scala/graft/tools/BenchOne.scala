package graft.tools

/** Dedicated-run bench for a named subset of queries: one fresh JVM,
  * the same session/warmup shape as [[graft.Bench]], each query run
  * `n` times with the inter-query GC + pinned-storage sweep. Exists
  * to pin regressions the 130-query sequential bench can't isolate
  * (round 6: m03; round 8→9: m07) — three invocations of this give
  * three independent dedicated sessions whose per-run AND per-phase
  * numbers (queries like m07 print phase timings to stderr) can be
  * compared directly.
  *
  * Usage: runMain graft.tools.BenchOne <sfDir> <n> <q1,q2,...>
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args(2).split(',').toSeq
    val spark = graft.core.Sessions.local("graft-bench-one",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
    val sc = spark.sparkContext
    // same untimed warmups as Bench: FS cache + codegen, and the
    // m-pack's shared featurization so m01–m06 numbers stay
    // train+predict-only
    try graft.core.Tables.lineitem(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"[warmup] $e") }
    if (names.exists(_.startsWith("m")))
      try graft.queries.MlQueries.warmFeaturized(spark)
      catch { case e: Throwable => System.err.println(s"[warmup] $e") }
    val keepIds = sc.getPersistentRDDs.keySet
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to n).map { i =>
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        sc.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!keepIds.contains(id)) rdd.unpersist(blocking = false)
        }
        println(f"[bench-one] $name run$i%d ${dt}%.2f s")
        dt
      }
      println(f"[bench-one] $name min=${times.min}%.2f " +
        f"median=${times.sorted.apply(times.length / 2)}%.2f " +
        f"max=${times.max}%.2f s over $n runs")
    }
    spark.stop()
  }
}
