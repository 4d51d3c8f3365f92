package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native single-pass kernel for t20's bigram-LM scoring: walk the
  * token array once, look each adjacent pair up in the (bounded)
  * model map, fold the log-probs left-to-right and round the mean
  * once — no gram-string array, no `sequence` index array, no lambda
  * frames per element.
  *
  * Value-identical to the composed form
  * `Analysis.unigramAvgLogProb(Analysis.ngrams(toks, 2), model,
  * floor)` (parity on random corpora in ExpressionSpec): same
  * "w1 w2" key identity (whitespace-split tokens cannot contain a
  * space), same 0.0-seeded left-to-right double fold, and the mean
  * rounds via the exact `Round` formula Catalyst applies to doubles
  * (`BigDecimal.valueOf(x).setScale(6, HALF_UP)`). The composed form
  * built ~|tokens| gram strings per row through three Catalyst HOFs
  * and measured 6.2 s of t20's 19.8 s at sf0.1.
  *
  * Returns struct(n_bigrams int, avg_logprob double); docs with
  * fewer than 2 tokens score (0, 0.0) — the composed `when` guard.
  */
case class BigramLogProbExpr(child: Expression,
    model: Map[String, Double], floorLp: Double)
    extends UnaryExpression {

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    model.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    m
  }

  override def dataType: DataType = BigramLogProbExpr.OutType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bigram_logprob"

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
    else BigramLogProbImpl.score(v.asInstanceOf[ArrayData], table, floorLp)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bigramModel", table,
      "java.util.HashMap")
    val floorRef = ctx.addReferenceObj("bigramFloor",
      java.lang.Double.valueOf(floorLp), "java.lang.Double")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.expressions.BigramLogProbImpl" +
        s".score($c, $tableRef, $floorRef.doubleValue());"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BigramLogProbExpr = copy(child = newChild)
}

object BigramLogProbExpr {
  val OutType: StructType = StructType(Seq(
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("avg_logprob", DoubleType, nullable = false)))
}

object BigramLogProbImpl {
  def score(arr: ArrayData,
            table: java.util.HashMap[String, java.lang.Double],
            floorLp: Double): InternalRow = {
    val n = arr.numElements()
    if (n < 2)
      return new GenericInternalRow(Array[Any](0, 0.0))
    var acc = 0.0
    var prev = arr.getUTF8String(0).toString
    var i = 1
    while (i < n) {
      val cur = arr.getUTF8String(i).toString
      val lp = table.get(prev + " " + cur)
      acc += (if (lp == null) floorLp else lp.doubleValue())
      prev = cur
      i += 1
    }
    // exactly Catalyst Round(double, 6): BigDecimal.valueOf + HALF_UP
    val mean = java.math.BigDecimal.valueOf(acc / (n - 1))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    new GenericInternalRow(Array[Any](n - 1, mean))
  }
}
