package graft.tools

/** Round-14 m08 iteration-cost probe: featurize once, then time the
  * 300-iteration SGD training phase under the current TwoLayerNet
  * internals — sequential vs two-concurrent — plus a single-iteration
  * microbreakdown. Usage: runMain graft.tools.M08Probe [reps]
  */
object M08Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("graft-m08-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[m08-probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val fz = graft.features.RddPipeline.featurize(spark,
      graft.core.Csv.TrainCsv, dim = 1000, dictFilter = Some("1"))
    val (tr, _) = graft.features.RddPipeline.gateSplit(fz.data)
    val rdd = tr.rdd.persist()
    println(s"[m08-probe] rows=${rdd.count()} parts=${rdd.getNumPartitions}")
    val cfg = graft.gd.TwoLayerNet.Config(optimizer = "SGD")
    // JIT warmup
    timed("warmup train(30)")(graft.gd.TwoLayerNet.trainRdd(rdd,
      cfg.copy(iterations = 30)))
    timed("sequential SGD 300")(graft.gd.TwoLayerNet.trainRdd(rdd, cfg))
    timed("sequential Adam 300")(graft.gd.TwoLayerNet.trainRdd(rdd,
      cfg.copy(optimizer = "Adam")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    timed("concurrent SGD+Adam 300") {
      val fs = Seq("SGD", "Adam").map(o => Future {
        graft.gd.TwoLayerNet.trainRdd(rdd, cfg.copy(optimizer = o)) })
      fs.foreach(Await.result(_, Duration.Inf))
    }
    // single-job floor: how long does one empty-ish pass over the
    // cached RDD take at this partition count?
    timed("100 count() jobs") {
      var k = 0; while (k < 100) { rdd.count(); k += 1 }
    }
    timed("100 mapPartitions-sum jobs") {
      var k = 0
      while (k < 100) {
        rdd.mapPartitions { it =>
          var s = 0.0; while (it.hasNext) s += it.next().label
          Iterator.single(s)
        }.reduce(_ + _)
        k += 1
      }
    }
    spark.stop()
  }
}
