package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, SparkSession => CSparkSession}

/** Static factory bridging custom logical plans into public Datasets
  * (the classic Dataset.ofRows is private[sql]) — the standard
  * pattern used by Spark-extension libraries (e.g. the Qbeast/Delta
  * connector layout).
  */
object GraftPlans {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
