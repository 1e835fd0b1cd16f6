package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to build a DataFrame from a custom catalyst [[LogicalPlan]] on
  * the classic runtime (`Dataset.ofRows` is `private[sql]`). */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** True iff the session's CacheManager holds no entries
    * (`sharedState` is `private[sql]`, hence the bridge). Used by
    * CacheHygieneSpec to prove that lazy-returning operators leave no
    * session-lifetime persisted frames behind. */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
