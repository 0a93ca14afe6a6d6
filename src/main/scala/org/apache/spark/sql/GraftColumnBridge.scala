package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** The one sanctioned crossing between custom Catalyst `Expression`s and
  * the public `Column` API (Spark 4 made both directions private[sql];
  * this bridge is the standard extension-library pattern). Keep this
  * file the ONLY one in the org.apache.spark.sql package.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a logical plan (private[sql] upstream) — lets the
    * native-JSON differential spec rewrite a plan's
    * `StructToJsonNative` nodes back to the built-in `to_json` and run
    * both, proving byte-equality over the full corpus.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** True iff the session's CacheManager has no registered plans. A
    * `DataFrame.persist` that never materialized leaves no blocks in
    * `getPersistentRDDs` but still registers here (and silently
    * rewrites every later overlapping plan to read the stale cache) —
    * the persist-lifecycle guard checks both.
    */
  def cacheManagerEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Whether the RDD was marked for LOCAL checkpointing (private[rdd]
    * on RDD — bytecode-public, read via reflection). Locally-
    * checkpointed entries in `getPersistentRDDs` are cleaner-managed —
    * the ContextCleaner releases their blocks when the RDD is
    * garbage-collected — so the persist-lifecycle guard exempts them.
    */
  def isLocallyCheckpointed(r: org.apache.spark.rdd.RDD[_]): Boolean =
    localCkptMethod.invoke(r).asInstanceOf[Boolean]

  private lazy val localCkptMethod =
    classOf[org.apache.spark.rdd.RDD[_]].getMethod("isLocallyCheckpointed")
}
