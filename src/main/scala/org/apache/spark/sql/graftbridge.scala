package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-package-private Column↔Expression converters
  * (Spark 4 moved the classic Column(expr) constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * private[sql]). This is the supported conversion path for libraries
  * that define custom Catalyst expressions against the classic API. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager ColumnNode→catalyst conversion. Unlike [[expression]] (a lazy
    * wrapper that the analyzer won't descend into when planted via a
    * function-registry builder), this produces a real catalyst tree whose
    * Unresolved* nodes the analyzer resolves normally. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame over an already-resolved logical plan (Dataset.ofRows is
    * private[sql]). Attribute ids of the plan are preserved, so
    * catalyst expressions captured alongside the plan (a DML
    * condition referencing the relation's output) still resolve when
    * re-applied via [[column]]. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** A single-leaf DataFrame over an InternalRow RDD with
    * `isStreaming = true` — the shape a V1 streaming `Source.getBatch`
    * must return (MicroBatchExecution asserts it; FileStreamSource /
    * RateStreamSource build exactly this). The RDD is lazy, so passing
    * a computed plan's `queryExecution.toRdd` defers all work to the
    * micro-batch's own execution while hiding the plan's batch leaves
    * from the incremental planner (a join-bearing delta plan with
    * streaming-marked leaves would be re-planned as a stateful
    * streaming join). */
  def streamingDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The session's (shared, mutable) extensions object —
    * `SparkSession.extensions` is private[sql]. Rules injected here are
    * picked up by sessions whose state materializes AFTERWARDS
    * (`newSession()`); already-built analyzers are unaffected. */
  def extensionsOf(spark: SparkSession): SparkSessionExtensions =
    spark.asInstanceOf[classic.SparkSession].extensions

  /** A NULL connector-level column default of the given type
    * ([[org.apache.spark.sql.connector.expressions.LiteralValue]] is
    * `private[sql]` — this is the bridge for DSv2 tables declaring
    * generated/provenance columns whose inputs are optional). */
  def nullColumnDefault(
      dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.catalog.ColumnDefaultValue =
    new org.apache.spark.sql.connector.catalog.ColumnDefaultValue(
      "NULL",
      org.apache.spark.sql.connector.expressions.LiteralValue(null, dt))

  /** DSv2 `Column[]` → `StructType` (`CatalogV2Util` is private[sql]) —
    * the conversion the TableInfo `createTable` overload needs. */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .v2ColumnsToStructType(cols)

  /** If the column is a sort order (`col.asc` / `col.desc`), return its
    * child column and whether the direction is ascending. The sort
    * wrapper lives at the ColumnNode layer in Spark 4, not in the lazily
    * converted catalyst expression. */
  def unwrapSortOrder(c: Column): Option[(Column, Boolean)] = c.node match {
    case internal.SortOrder(child, direction, _, _) =>
      Some((Column(child), direction == internal.SortOrder.Ascending))
    case _ => None
  }
}
