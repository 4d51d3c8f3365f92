package graft.tools

/** Emits the golden values for m07's gate row (queries/M07Golden):
  * confusion counts, split sizes, the cost-curve head and the final
  * cost — the OracleDump discipline applied to the GD stack. Run a
  * few times; everything but lastCost must be bit-identical
  * (DeterminismProbe round-10 evidence: accuracy/f1/first_cost stable
  * across 9 runs, last_cost jitters in its final ~2 ULPs).
  */
object M07Dump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("graft-m07-dump",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val fz = graft.features.RddPipeline.featurize(spark,
      graft.core.Csv.TrainCsv, dim = 10000)
    // Same deterministic split + pinned layout as the gate row —
    // shared via RddPipeline.gateSplit so they cannot drift.
    val (tr, testing) = graft.features.RddPipeline.gateSplit(fz.data)
    tr.persist().count(); testing.persist().count()
    // localFinishRows = 0: goldens stay anchored to the DISTRIBUTED
    // job shape (the round-15 bounded local finish reproduces them
    // within the gate bands — GdLocalParitySpec)
    val res = graft.gd.GradientDescent.run(tr, 10000,
      graft.gd.LogisticLoss,
      graft.gd.GradientDescent.Config(iterations = 300,
        learningRate = 0.01, optimizer = "SGD",
        reg = graft.gd.GradientDescent.L2(1.15)),
      localFinishRows = 0L)
    val c = graft.gd.Predict.evaluate(testing, res.coef)
    println(s"[m07dump] train_n=${tr.count()} test_n=${testing.count()}")
    println(s"[m07dump] tp=${c.tp} tn=${c.tn} fp=${c.fp} fn=${c.fn}")
    println(s"[m07dump] accuracy=${c.accuracy} f1=${c.f1}")
    println("[m07dump] costsHead=" +
      res.costs.take(5).map(_.toString).mkString(","))
    println(s"[m07dump] lastCost=${res.costs.last}")
    tr.unpersist(); testing.unpersist(); fz.release()
    spark.stop()
  }
}
