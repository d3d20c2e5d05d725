package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters — the
  * supported way for an external library to wrap custom Catalyst
  * expressions as user-facing Columns on Spark 4.x (where `Column.expr`
  * left the public API). Lives in the `org.apache.spark.sql` package
  * solely to satisfy the access scope; no Spark internals are modified. */
object GraftColumnBridge {
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  /** `sharedState` is `private[sql]`; exposed for the cache-hygiene
    * invariant (graft.Caches.isEmpty / CacheHygieneSpec). */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState
      .cacheManager.isEmpty
}
