package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only access to the LIVE SparkContext conf (`sc.conf` is
  * private[spark]; `sc.getConf` hands back a defensive clone). Spark reads
  * `spark.driver.maxResultSize` from the live conf at every TaskSetManager
  * creation, so shrinking it mid-session genuinely tightens the driver's
  * task-result enforcement for all subsequent stages — which lets a spec
  * prove the annJoin exact-stage clamp falls back BEFORE its collect would
  * abort, against the real knob instead of a test seam. Callers must
  * restore the previous value in a finally block. */
object TestSparkConf {
  def get(sc: SparkContext, key: String): Option[String] = sc.conf.getOption(key)
  def set(sc: SparkContext, key: String, value: String): Unit = sc.conf.set(key, value)
  def remove(sc: SparkContext, key: String): Unit = sc.conf.remove(key)
}
