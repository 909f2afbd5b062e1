package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters, needed to
  * expose custom Catalyst expressions (e.g. graft.functions.SimHash64) as
  * Columns in Spark 4's column-node API. Lives in the org.apache.spark.sql
  * namespace solely to satisfy the access modifier — the standard pattern for
  * Spark-native extension libraries. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
