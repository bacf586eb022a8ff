package org.apache.spark.sql.graftprobe

import org.apache.spark.sql.SparkSession

/** Test-only access to the session CacheManager (private[sql]): the
  * cache-hygiene gates (DedupSimSpec, VERDICT r12 #2) assert that the
  * dedup pair builders release every internal persist before
  * returning, which needs visibility into whether ANY relation is
  * still registered — spark.catalog has no listing API. Lives in a
  * subpackage of org.apache.spark.sql purely for access; no Spark
  * internals are modified.
  */
object CacheProbe {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
