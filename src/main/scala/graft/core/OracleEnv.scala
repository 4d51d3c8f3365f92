package graft.core

/** Decides whether the environment-pinned bit-exact literal oracles
  * (m01–m06, e05, m07's confusion counts) are trustworthy here, or
  * whether the gate should emit quality-band rows instead.
  *
  * The pinned literals were measured stable (tools.DeterminismProbe)
  * on ONE stack: HotSpot JVM major 17 on linux/amd64 with Spark's
  * pure-JVM netlib BLAS (`Java11BLAS` — the JNI/OpenBLAS and
  * Vector-API backends both absent). A different JVM major, CPU
  * architecture, or a native BLAS may round one dot product
  * differently, flip one of ~1557 test predictions, and move
  * accuracy/f1 by ~6.4e-4 — far beyond a hash compare. On such a
  * stack the gate must DEGRADE to banded assertions (accuracy/F1
  * inside the MlPipelineSpec quality bands, e05 recall ≥ 0.9 vs the
  * exact scan) rather than hard-fail on literals that were never
  * pinned there.
  *
  * Both the Spark query and its oracle SQL are generated in the same
  * JVM (graft.Verify dumps oracle_sql.json in the run that writes the
  * result parquet), so the two sides always agree on the mode.
  *
  * Override order: `-Dgraft.oracle.mode=pinned|banded` system
  * property (specs use this — settable per-JVM without re-exec), then
  * `GRAFT_ORACLE_MODE=pinned|banded` env var (drivers/CI), then the
  * fingerprint check.
  */
object OracleEnv {

  /** The stack the literals were pinned on (see scaladoc). */
  val PinnedFingerprint = "jvm17/amd64/Java11BLAS"

  /** JVM major / arch / netlib BLAS implementation — the three
    * things that can flip a float rounding in the pinned trainers.
    * BLAS resolution failure degrades to "unknown" (→ banded), never
    * throws: a missing netlib on the classpath is exactly the kind of
    * foreign stack the fallback exists for.
    */
  def fingerprint: String = {
    val major = System.getProperty("java.version", "?").takeWhile(_ != '.')
    val arch = System.getProperty("os.arch", "?")
    val blas =
      try Class.forName("dev.ludovic.netlib.blas.BLAS")
        .getMethod("getInstance").invoke(null)
        .getClass.getSimpleName
      catch { case _: Throwable => "unknown" }
    s"jvm$major/$arch/$blas"
  }

  /** Pure decision function — spec'd directly in OracleEnvSpec. */
  def decide(prop: Option[String], env: Option[String],
             fp: String): Boolean =
    prop.orElse(env) match {
      case Some("pinned") => true
      case Some("banded") => false
      case Some(other) => throw new IllegalArgumentException(
        s"graft.oracle.mode must be 'pinned' or 'banded', got '$other'")
      case None => fp == PinnedFingerprint
    }

  /** true → emit bit-exact literal oracles; false → quality bands.
    * Read per call (not cached) so specs can flip the system property
    * around individual assertions.
    */
  def bitExact: Boolean =
    decide(sys.props.get("graft.oracle.mode"),
      sys.env.get("GRAFT_ORACLE_MODE"), fingerprint)
}
