package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge.
  *
  * Spark 4 made the conversion `private[sql]` (Column is backed by a
  * ColumnNode shared with Connect). Registering a FunctionRegistry builder
  * for an expression COMPOSED with the public Column API (e.g. exposing
  * `graft.functions.Text.tokenizeCjk` as the SQL function `tokenize_cjk`)
  * needs exactly this conversion — the alternative is duplicating every
  * function body as a parsed SQL template, which can silently diverge from
  * the Column form. A same-package shim is the established extension
  * pattern for this (Delta Lake and Frameless ship the same bridge); it
  * touches only the two conversion calls, nothing else behind the seal.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
