package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` / `Column.expr`
  * surface; the supported conversion lives in the classic module behind
  * `private[sql]`. This bridge (placed under the `org.apache.spark.sql`
  * package namespace, the standard pattern for Spark extension libraries)
  * re-exposes exactly the two conversions a custom Catalyst `Expression`
  * library needs. No Spark internals are modified.
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions instance's injected functions to a
    * registry — lets tests exercise the `spark.sql.extensions` config
    * path (normally invoked by session bootstrap) without building a
    * second SparkSession.
    */
  def registerInjectedFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)
}
