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
    ext.injectFunction((
      new FunctionIdentifier("graft_lemmatize"),
      new ExpressionInfo(classOf[LemmatizeWord].getName,
        null, "graft_lemmatize",
        "graft_lemmatize(word) - WordNet-morphy noun lemma of `word`.",
        ""),
      (children: Seq[Expression]) => LemmatizeWord(children.head)))
  }
}
