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

  /** DataFrame over already-computed InternalRows
    * (`internalCreateDataFrame` is `private[sql]`) — what a V1
    * streaming Sink needs to RE-ANCHOR the micro-batch DataFrame it
    * receives: calling write actions directly on the passed-in frame
    * would re-trigger its (streaming-incremental) query execution;
    * wrapping its executed RDD gives a plain batch frame computed
    * exactly once. */
  def dataFrameOfInternalRows(spark: SparkSession,
                              rows: org.apache.spark.rdd.RDD[
                                org.apache.spark.sql.catalyst.InternalRow],
                              schema: org.apache.spark.sql.types.StructType
                             ): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = false)

  /** The STREAMING-marked twin — what a V1 streaming Source needs to
    * return a micro-batch whose rows come from an arbitrary batch
    * plan (e.g. a change-feed computation with joins and set ops):
    * the batch plan is planned to its RDD lineage at getBatch time
    * (no job runs yet) and re-anchored as a streaming LogicalRDD the
    * incremental planner accepts. */
  def streamingDataFrameOfInternalRows(spark: SparkSession,
                                       rows: org.apache.spark.rdd.RDD[
                                         org.apache.spark.sql.catalyst.InternalRow],
                                       schema: org.apache.spark.sql.types.StructType
                                      ): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)
}
