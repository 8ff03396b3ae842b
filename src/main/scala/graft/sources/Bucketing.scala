package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) tables — the shuffle-elimination path for joins
  * that repeat on the same key. Writing both sides bucketed+sorted on the
  * join key lets Spark sort-merge join them with NO Exchange on either
  * side: at 100 TB, the one-time bucketed write amortizes across every
  * subsequent join/aggregation keyed the same way.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int
  ): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner should
    * produce a SortMergeJoin with zero shuffle exchanges. */
  def colocatedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: (String, String)
  ): DataFrame =
    spark.table(left).join(spark.table(right), spark.table(left)(key._1) === spark.table(right)(key._2))
}
