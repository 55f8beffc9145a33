package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim: Column ↔ Expression conversion lives in
  * `private[sql]` scope in Spark 4 (classic.ExpressionUtils); custom
  * Catalyst expressions need it to expose a Column API. This is the
  * standard extension-library pattern — no Spark internals are
  * modified, just re-exported for graft.plans. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an arbitrary logical plan (Dataset.ofRows is
    * `private[sql]` in Spark 4) — what graft.sources.SnapshotSql
    * needs to surface its manifest-pruned HadoopFsRelation as a
    * queryable view. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
            ): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
