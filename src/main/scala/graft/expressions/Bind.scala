package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Optimizer-proof let-binding for expensive intermediate expressions.
  *
  * Catalyst's project-collapsing rewrites can inline a multiply- or
  * lambda-referenced alias back into its consumers; when the consumer
  * reference sits INSIDE a higher-order-function lambda the inlined
  * tree is then re-evaluated per array ELEMENT, and when consumers
  * chain (e21's greedy rounds) the plan grows geometrically — measured
  * on e21 selK=1→5: optimized-plan size 2.2 kB → 41.6 kB and wall
  * time 0.25 s → 5.5 s before this helper existed.
  *
  * `Bind.once(e)(f)` evaluates `e` exactly once per row no matter what
  * the optimizer does, by routing it through a single-element array
  * and binding the lambda VARIABLE (runtime value, not a plan
  * subtree): `transform(array(e), x => f(x))[1]`. No current rule
  * rewrites a lambda variable back into its defining expression.
  */
object Bind {
  /** let x = e in f(x) — `e` computed once per row. */
  def once(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)
}
