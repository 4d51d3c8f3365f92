package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name prefixes — run only those
    // queries (local iteration; the driver always runs the full set).
    val only = args.lift(2).map(_.split(',').toSeq)
    val spark = graft.core.Sessions.local("graft-verify",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    // Sweep each query's leftover pinned storage (persists +
    // localCheckpoint blocks) once its output is written — a 130-query
    // session otherwise accumulates every checkpoint ever taken
    // (see Bench.scala / core/Checkpoints.scala). Pre-existing pins
    // (none today) would be preserved via the keepIds snapshot.
    val sc = spark.sparkContext
    val keepIds = sc.getPersistentRDDs.keySet
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        e.printStackTrace()
        // Fail-loud sentinel: a crashed query must not vanish from the
        // gate. Write a 0-row frame whose schema can never match an
        // oracle (and whose rowcount fails a rows-only check), so the
        // driver's compare records an explicit fail instead of
        // omitting the entry.
        try {
          import spark.implicits._
          Seq.empty[String].toDF("__verify_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
      finally sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keepIds.contains(id)) rdd.unpersist(blocking = false)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-diagnosing gate: the resolved oracle mode, environment
    // fingerprint, parallelism, and each pinned query's RAW measured
    // values (GateDiag) land next to the outputs, so a driver-side
    // hash fail on a pinned row carries its own evidence —
    // check_oracle.py prints this file on FAIL. Round-10's m07 red
    // cell (partition-layout-dependent split, visible only as a bare
    // hash_match=false) is the failure class this closes.
    def opt(o: Option[String]): String = o.map(q).getOrElse("null")
    val env = graft.core.OracleEnv
    val envJson = Seq(
      s"""\"oracle_mode\": ${q(if (env.bitExact) "pinned" else "banded")}""",
      s"""\"fingerprint\": ${q(env.fingerprint)}""",
      s"""\"pinned_fingerprint\": ${q(env.PinnedFingerprint)}""",
      s"""\"mode_override_prop\": ${opt(sys.props.get("graft.oracle.mode"))}""",
      s"""\"mode_override_env\": ${opt(sys.env.get("GRAFT_ORACLE_MODE"))}""",
      s"""\"master\": ${q(sc.master)}""",
      s"""\"default_parallelism\": ${sc.defaultParallelism}""",
      s"""\"shuffle_partitions\": ${q(spark.conf.get("spark.sql.shuffle.partitions"))}""",
      s"""\"spark_graft_cpus\": ${opt(sys.env.get("SPARK_GRAFT_CPUS"))}""",
      s"""\"java_version\": ${q(System.getProperty("java.version", "?"))}""",
      s"""\"spark_version\": ${q(spark.version)}""",
      s"""\"measured\": ${graft.core.GateDiag.snapshotJson}"""
    ).mkString("{", ", ", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_env.json"), envJson)
    spark.stop()
  }
}
