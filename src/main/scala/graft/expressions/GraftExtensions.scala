package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions in the session function registry so they are callable
  * from SQL text and `call_function`, in addition to the typed Column
  * helpers. Activate via `Sessions.local` (wired) or
  * `spark.sql.extensions=graft.expressions.GraftExtensions` on any
  * externally-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer rule: composed HOF dot/norm idioms → fused native
    // kernels (bit-identical, codegen'd; see plans/KernelSubstitution)
    ext.injectOptimizerRule(_ => graft.plans.KernelSubstitution)

    ext.injectFunction((
      new FunctionIdentifier("graft_lemmatize"),
      new ExpressionInfo(classOf[LemmatizeWord].getName,
        null, "graft_lemmatize",
        "graft_lemmatize(word) - WordNet-morphy noun lemma of `word`.",
        ""),
      (children: Seq[Expression]) => LemmatizeWord(children.head)))

    ext.injectFunction((
      new FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName,
        null, "graft_simhash60",
        "graft_simhash60(hashes) - 60-bit SimHash fingerprint of an " +
          "array of 64-bit token hashes (one-pass vote loop).", ""),
      (children: Seq[Expression]) => SimHash60(children.head)))

    ext.injectFunction((
      new FunctionIdentifier("graft_simhash_text"),
      new ExpressionInfo(classOf[SimHashText].getName,
        null, "graft_simhash_text",
        "graft_simhash_text(tokens) - 60-bit SimHash fingerprint of a " +
          "token array (fused md5 + vote loop).", ""),
      (children: Seq[Expression]) => SimHashText(children.head)))

    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotF64].getName, null, "graft_dot",
        "graft_dot(a, b) - sequential-order float64 dot product.", ""),
      (children: Seq[Expression]) => DotF64(children(0), children(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SqDistF64].getName, null, "graft_sqdist",
        "graft_sqdist(a, b) - sequential-order squared L2 distance.", ""),
      (children: Seq[Expression]) => SqDistF64(children(0), children(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[NormF64].getName, null, "graft_norm",
        "graft_norm(a) - sequential-order L2 norm.", ""),
      (children: Seq[Expression]) => NormF64(children.head)))

    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashAgg].getName,
        null, "graft_minhash",
        "graft_minhash(shingle, k) - aggregate: k-permutation MinHash " +
          "signature (md5 basis) of the group's shingles.", ""),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case e if e.foldable =>
            e.eval().asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"graft_minhash: k must be a literal, got $other")
        }
        MinHashAgg(children.head, k).toAggregateExpression()
      }))
  }
}
