package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encode kernel: apply a learned merge-rule list to a
  * token array, producing the boundary-marked encoded string
  * (`#lo##w#` form — identical output to
  * [[graft.operators.Bpe.encode]]'s chained-replace plan, which
  * remains the executable spec and the DuckDB-oracle mirror; parity
  * on random corpora incl. the 256-merge sliced path in BpeSpec).
  *
  * Semantics parity: each rule merges adjacent symbol pairs
  * LEFT-TO-RIGHT, NON-OVERLAPPING, in rank order — exactly what the
  * `replace("#l##r#" → "#lr#")` chain does (a merge pattern can
  * never span the space between words, and `#` cannot occur in
  * token content by the Bpe caller contract).
  *
  * Why native, and what it buys at scale: the replace chain copies
  * the document string once PER RULE (12 rules ⇒ 12 corpus copies;
  * measured 89 s at pseudo-sf10 for bpe04's encode+decode), and its
  * plan depth grows with the rule count — the reason
  * `Bpe.MaxPlanMerges` and the sliced-encode/checkpoint path exist.
  * This kernel applies ALL rules in one pass per word over symbol
  * arrays, skipping inapplicable rules with O(1) presence counts, so
  * a production 30k-rule tokenizer encodes in ONE expression with no
  * plan-depth ceiling and no inter-slice checkpoints.
  */
case class BpeEncodeExpr(child: Expression,
                         merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_encode"
  // keep the (possibly 30k-entry) rule list out of plan strings
  override def toString: String =
    s"graft_bpe_encode($child, ${merges.size} rules)"

  @transient private lazy val rules: Array[(String, String)] =
    merges.toArray

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
    else BpeEncodeImpl.encode(v.asInstanceOf[ArrayData], rules)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val rulesRef = ctx.addReferenceObj("bpeRules", rules,
      "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.expressions.BpeEncodeImpl" +
        s".encode($c, $rulesRef);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeExpr = copy(child = newChild)
}

object BpeEncodeImpl {
  def encode(arr: ArrayData,
             rules: Array[(String, String)]): UTF8String = {
    val nWords = arr.numElements()
    val out = new java.lang.StringBuilder
    var w = 0
    while (w < nWords) {
      if (w > 0) out.append(' ')
      encodeWord(arr.getUTF8String(w).toString, rules, out)
      w += 1
    }
    UTF8String.fromString(out.toString)
  }

  private def encodeWord(word: String,
                         rules: Array[(String, String)],
                         out: java.lang.StringBuilder): Unit = {
    // initial symbols: one per character (the mark() form)
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      syms(i) = String.valueOf(word.charAt(i)); i += 1
    }
    var len = syms.length
    // presence counts make skipping an inapplicable rule O(1) — the
    // common case for a long rule list against a short word
    val present = new java.util.HashMap[String, Int]()
    def bump(k: String, d: Int): Unit =
      present.put(k, present.getOrDefault(k, 0) + d)
    i = 0
    while (i < len) { bump(syms(i), 1); i += 1 }
    var r = 0
    while (r < rules.length) {
      val (l, rh) = rules(r)
      if (present.getOrDefault(l, 0) > 0 &&
          present.getOrDefault(rh, 0) > 0) {
        // left-to-right, non-overlapping merge of adjacent (l, rh)
        var read = 0
        var write = 0
        while (read < len) {
          if (read + 1 < len && syms(read) == l && syms(read + 1) == rh) {
            val merged = l + rh
            syms(write) = merged
            bump(l, -1); bump(rh, -1); bump(merged, 1)
            read += 2
          } else {
            syms(write) = syms(read)
            read += 1
          }
          write += 1
        }
        len = write
      }
      r += 1
    }
    out.append('#')
    i = 0
    while (i < len) {
      if (i > 0) out.append("##")
      out.append(syms(i))
      i += 1
    }
    out.append('#')
  }
}
