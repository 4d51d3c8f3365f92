package graft.tools

/** Prints a query's result as a DuckDB `VALUES` literal block — the
  * generation side of the literal-oracle discipline (MlQueries
  * trainerOracle, DedupQueries e05): run a DeterminismProbe-vetted
  * query once per gate SF and paste the emitted rows into the oracle
  * SQL. Doubles render via `Double.toString` (round-trips exactly;
  * DuckDB's `CAST(VARCHAR AS DOUBLE)` parses correctly rounded, so
  * the oracle reproduces the same bits).
  *
  * Usage: runMain graft.tools.OracleDump <sfDir> <query>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = graft.core.Sessions.local("graft-oracle-dump",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println("-- columns: " + df.schema.map(f =>
      s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    val lines = df.collect().map { r =>
      r.toSeq.map {
        case null => "NULL"
        case d: Double => s"CAST('$d' AS DOUBLE)"
        case f: Float => s"CAST('$f' AS FLOAT)"
        case l: Long => s"CAST($l AS BIGINT)"
        case i: Int => s"CAST($i AS INTEGER)"
        case s: String => "'" + s.replace("'", "''") + "'"
        case v => v.toString
      }.mkString("(", ",", ")")
    }.sorted
    println(lines.mkString(",\n"))
    spark.stop()
  }
}
