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
      // Coalesce post-shuffle partitions to the advisory BYTE size,
      // not to the core count: with the default parallelismFirst=true
      // AQE targets max(totalBytes/defaultParallelism, 1MB), so on a
      // 32-core session every tiny reduce stage keeps up to 32
      // partitions and pays 32 tasks of fixed cost for KBs of data
      // (driver bench r14: q25/q10/q02/e11/d11 ran 2-5x faster at 8
      // cores purely from this). Spark's own docs recommend false.
      // The advisory size is env-tunable: 16m locally keeps decade-
      // scale stages (100MB+) at full width while collapsing the
      // fixed-cost tail; a production deploy raises it toward the
      // guide's 100MB-1GB shuffle-partition sizing.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "16m"))
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
