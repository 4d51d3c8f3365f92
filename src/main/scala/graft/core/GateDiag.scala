package graft.core

import scala.collection.concurrent.TrieMap

/** Raw-measurement side channel for the pinned/banded gate rows
  * (m01–m07, e05): the gate's output is literals or band booleans,
  * so when a driver-side hash compare fails, the row itself carries
  * no evidence of WHAT was measured. Queries record their raw values
  * here; `graft.Verify` dumps the snapshot into `oracle_env.json`
  * next to the outputs, and `scripts/check_oracle.py` prints it on
  * FAIL — a red cell then explains itself without a local re-run
  * (round-10's m07 red row needed exactly that).
  *
  * Values are stringified at record time (shortest-roundtrip doubles
  * via toString), keyed by query name; re-recording a query replaces
  * its entry. TrieMap because Verify may run queries from a shared
  * session while specs poke at the same JVM.
  */
object GateDiag {

  private val entries = TrieMap.empty[String, String]

  /** JSON string escape (mirrors Verify.q — control chars included). */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) q(d.toString) else d.toString
    case f: Float =>
      if (f.isNaN || f.isInfinite) q(f.toString) else f.toString
    case xs: Array[Double] => xs.map(jsonVal).mkString("[", ",", "]")
    case xs: Seq[_] => xs.map(jsonVal).mkString("[", ",", "]")
    case other => q(other.toString)
  }

  /** Record (replace) a query's raw measurements. */
  def record(query: String, kv: (String, Any)*): Unit = {
    entries(query) =
      kv.map { case (k, v) => s"${q(k)}: ${jsonVal(v)}" }
        .mkString("{", ", ", "}")
    ()
  }

  /** All recorded entries as one JSON object string. */
  def snapshotJson: String =
    entries.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: $v" }
      .mkString("{", ", ", "}")

  def clear(): Unit = entries.clear()
}
