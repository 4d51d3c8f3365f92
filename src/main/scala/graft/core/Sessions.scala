package graft.core

import org.apache.spark.sql.SparkSession

/** One place to build a correctly-configured local session.
  *
  * Defaults are scale-aware: AQE on (runtime shuffle-partition
  * coalescing + skew-join splitting), shuffle partitions sized to the
  * local core count instead of Spark's default 200 (on a real cluster
  * the deploy config overrides this), UTC so timestamps hash the same
  * as the DuckDB oracle.
  */
object Sessions {
  def local(appName: String = "graft",
            cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "*"))
      : SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        if (cores == "*") "32" else cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); read as raw long once
      // session-wide instead of mutating conf inside a table loader.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
