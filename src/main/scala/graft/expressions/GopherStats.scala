package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native single-pass kernel for t18's Gopher-rule statistics: token
  * count, summed token length, max token multiplicity, distinct
  * stop-words present, 2-gram count and duplicate-2-gram count — all
  * integers, from ONE sweep with two hash tables.
  *
  * Value-identical to the composed HOF form it replaced (token
  * lengths via `UTF8String.numChars`, exactly Catalyst's `length`;
  * 2-gram identity = the adjacent token PAIR, equivalent to the
  * joined `"w1 w2"` string because whitespace-split tokens cannot
  * contain a space) — parity on random corpora in ExpressionSpec.
  * The composed form paid an O(n·distinct)-ish chain of array
  * allocations per row and measured 58.4 s at pseudo-sf10.
  *
  * Returns struct(n_tokens, sum_len, top_count, n_stop_distinct,
  * n_2grams, n_dup_2grams).
  */
case class GopherStatsExpr(child: Expression, stopWords: Seq[String])
    extends UnaryExpression {

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopWords.foreach(s.add)
    s
  }

  override def dataType: DataType = GopherStatsExpr.OutType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_gopher_stats"

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
    else GopherStatsImpl.stats(v.asInstanceOf[ArrayData], stopSet)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("gopherStops", stopSet,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.expressions.GopherStatsImpl" +
        s".stats($c, $setRef);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): GopherStatsExpr = copy(child = newChild)
}

object GopherStatsExpr {
  val OutType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("n_stop_distinct", LongType, nullable = false),
    StructField("n_2grams", LongType, nullable = false),
    StructField("n_dup_2grams", LongType, nullable = false)))
}

object GopherStatsImpl {
  def stats(arr: ArrayData,
            stops: java.util.HashSet[String]): InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[String, Long]()
    val grams = new java.util.HashSet[(String, String)]()
    var sumLen = 0L
    var dup2 = 0L
    var prev: String = null
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      sumLen += u.numChars()
      val s = u.toString
      counts.put(s, counts.getOrDefault(s, 0L) + 1L)
      if (prev != null && !grams.add((prev, s))) dup2 += 1L
      prev = s
      i += 1
    }
    var top = 0L
    var stopDistinct = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > top) top = e.getValue
      if (stops.contains(e.getKey)) stopDistinct += 1L
    }
    val n2 = if (n >= 2) (n - 1).toLong else 0L
    new GenericInternalRow(Array[Any](
      n.toLong, sumLen, top, stopDistinct, n2, dup2))
  }
}
