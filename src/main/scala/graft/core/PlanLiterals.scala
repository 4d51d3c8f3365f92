package graft.core

/** Contract ceilings for driver-side models folded into plans as
  * literals (hyperplanes, k-means centroids, PQ codebooks, JL sign
  * matrices, unigram-LM maps).
  *
  * Literal folding is the right call below the ceiling: the model
  * rides the plan into every task with zero join, zero shuffle, full
  * codegen. But the plan is analyzed, optimized, and serialized per
  * query — a 500k-term map or a million-double codebook bloats every
  * one of those steps and can stall Catalyst long before the
  * executors see a row. These limits (~8 MB of doubles, 64k map
  * terms) mark where a model must switch to a `broadcast`-join
  * (dimension-table) form instead; the round-6 audit asked for the
  * boundary to be an explicit contract rather than folklore.
  */
object PlanLiterals {
  /** Max total Double literals one folded model may carry (1M ≈ 8 MB
    * in-plan).
    */
  val MaxDoubles: Long = 1L << 20

  /** Max entries in a folded scalar lookup map (unigram LM etc.). */
  val MaxMapTerms: Int = 1 << 16

  def requireDoubles(count: Long, who: String): Unit =
    require(count <= MaxDoubles,
      s"$who folds $count double literals into the plan " +
        s"(max $MaxDoubles); above the ceiling, ship the model as a " +
        "broadcast-joined table instead of plan literals")

  def requireMapTerms(count: Int, who: String): Unit =
    require(count <= MaxMapTerms,
      s"$who folds a $count-term literal map into the plan " +
        s"(max $MaxMapTerms); above the ceiling, ship the model as a " +
        "broadcast-joined table instead of a literal map")
}
