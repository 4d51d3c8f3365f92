package graft.core

import org.apache.spark.sql.SparkSession

/** Sinks (SURVEY.md §2.1 S5): the reference persists per-iteration
  * cost curves as a single text file via
  * `sc.parallelize(cost_array).coalesce(1).saveAsTextFile(dir)`
  * (`RDD_logisticregression.py:253-254`) and re-reads them for
  * plotting (S7). Output layout matches: one part file + _SUCCESS.
  */
object Sinks {

  /** Write one value per line to `dir` as a single part file. */
  def textSingleFile(spark: SparkSession, lines: Seq[String],
                     dir: String): Unit = {
    import spark.implicits._
    spark.createDataset(lines).coalesce(1).write.text(dir)
  }

  def costCurve(spark: SparkSession, costs: Seq[Double],
                dir: String): Unit =
    textSingleFile(spark, costs.map(_.toString), dir)

  /** S7 — golden-output re-scan: read a saved cost curve back as
    * doubles (`utils/plots.py:61-73`). Plain JVM IO — these files are
    * tiny driver artifacts by construction (one float per iteration).
    */
  def readCostCurve(dir: String): Seq[Double] = {
    val d = new java.io.File(dir)
    // listFiles() is null for a missing/non-directory path; an absent
    // curve must fail loudly, not read back as an empty Seq
    val parts = Option(d.listFiles())
      .getOrElse(sys.error(s"readCostCurve: no such directory: $dir"))
      .filter(_.getName.startsWith("part-")).sorted
    if (parts.isEmpty) sys.error(s"readCostCurve: no part- files in $dir")
    parts.flatMap { f =>
      scala.io.Source.fromFile(f).getLines().filter(_.nonEmpty)
        .map(_.toDouble).toSeq
    }.toSeq
  }
}
