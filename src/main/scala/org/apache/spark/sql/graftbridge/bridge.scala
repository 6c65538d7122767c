package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.classic.Dataset

/** Minimal package bridge: build a DataFrame from a custom LogicalPlan.
  * `Dataset.ofRows` is private[sql]; a one-line forwarder in an
  * org.apache.spark.sql subpackage is the standard extension-library
  * pattern for plugging custom logical nodes into a session. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(castToImpl(spark), plan)

  def logicalPlan(df: DataFrame): LogicalPlan = castToImpl(df).logicalPlan
}
