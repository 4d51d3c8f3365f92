// Plan audit: prints formatted physical plans for the hot/changed
// queries so broadcast joins, pushed filters, and codegen spans can be
// eyeballed. Run: sbt "runMain graft.tools.ExplainAudit [names...]"
package graft.tools

import graft.SparkEntry
import graft.core.Sessions

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-explain", "8")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d03_minhash_lsh_pairs", "e02_knn_lsh",
        "f03_tfidf", "mm01_binary_meta", "s01_csv_clean")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
