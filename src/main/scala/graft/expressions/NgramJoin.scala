package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram builder: all space-joined word n-grams of a token
  * array in ONE sweep, staying in `UTF8String` space (no
  * decode/encode round-trip, no `sequence` index array, no lambda
  * frames per gram). This is the hot inner loop of every
  * shingle/gram consumer — Dedup.shingles (d02/d03/d05/d12–d14),
  * t09/t13/t14, the t20 fit — where the composed
  * `transform(sequence(...), concat_ws(...))` form measured ~80% of
  * d03's shingle stage at sf0.1.
  *
  * Value-identical to the composed form in
  * [[graft.text.Analysis.ngramsComposed]] (parity on random corpora
  * in ExpressionSpec): same "w1 w2" join, `concat_ws`'s null-element
  * skip, and an empty array for docs shorter than n. Null INPUT
  * returns null here; `Analysis.ngrams` coalesces to the composed
  * form's empty array.
  */
case class NgramJoinExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"ngram n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_ngrams"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires array<string>, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else NgramJoinImpl.build(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.expressions.NgramJoinImpl.build($c, $n);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NgramJoinExpr = copy(child = newChild)
}

object NgramJoinImpl {
  private val Space = UTF8String.fromString(" ")

  def build(arr: ArrayData, n: Int): ArrayData = {
    val num = arr.numElements()
    if (num < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](num - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= num - n) {
      var j = 0
      while (j < n) {
        // null elements flow through: concatWs skips them, exactly
        // like the composed concat_ws
        window(j) = arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
