package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. In Spark 4 the Column constructor and
  * `Column#expr` are `private[sql]` (Column is backend-agnostic; the
  * Catalyst expression lives behind `classic.ExpressionUtils`), so
  * libraries that define custom Catalyst expressions need this
  * one-file shim inside the `org.apache.spark.sql` package tree —
  * the standard extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** All-string declared input types for custom expressions.
  * `ExpectsInputTypes.inputTypes` returns `AbstractDataType`, which is
  * `private[sql]` in Spark 4 — so the override has to live inside the
  * `org.apache.spark.sql` package tree, like [[ColumnBridge]]. Mixing
  * this in turns a mis-typed SQL call (`graft_lemmatize(123)`) into an
  * analysis-time implicit cast / error instead of a runtime
  * ClassCastException.
  */
trait StringInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  this: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    children.map(_ => org.apache.spark.sql.types.StringType)
}

/** Declared `bigint` input types — same reasoning as
  * [[StringInputTypes]].
  */
trait LongInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  this: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    children.map(_ => org.apache.spark.sql.types.LongType)
}

/** Declared `array<string>` input types — same reasoning as
  * [[StringInputTypes]].
  */
trait StringArrayInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  this: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    children.map(_ => org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType))
}

/** Declared `array<double>` input types — same reasoning as
  * [[StringInputTypes]]. ImplicitCastInputTypes makes an
  * `array<float>` argument arrive through an exact widening cast.
  */
trait DoubleArrayInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  this: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    children.map(_ => org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
}

/** Declared `(double, bigint)` input types for score+id aggregates —
  * same reasoning as [[StringInputTypes]]. ImplicitCastInputTypes
  * lets an int score (e.g. a Hamming distance) arrive through an
  * exact widening cast.
  */
trait ScoreIdInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  this: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.DoubleType,
      org.apache.spark.sql.types.LongType)
}

/** Declared `array<bigint>` input types — same reasoning as
  * [[StringInputTypes]] (the `AbstractDataType` return type is
  * `private[sql]`, so the override lives in this package tree).
  */
trait LongArrayInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  this: Expression =>
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    children.map(_ => org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType))
}
