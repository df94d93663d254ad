package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose custom
  * Catalyst expressions through the public Column API. Lives under the
  * `org.apache.spark.sql` package solely for access; no Spark internals are
  * modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Re-export of the `private[sql]` [[org.apache.spark.sql.types.AbstractDataType]]
  * so custom expressions outside Spark's package can declare `inputTypes`
  * (required for implicit input casts via `ExpectsInputTypes`).
  */
object TypeBridge {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
