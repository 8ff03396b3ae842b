package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.multimodal.MultimodalOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query catalog layout (one entry per operator row of SURVEY.md §2):
  *   - [[RelationalOps]]  scans/filters/joins/aggregations/windows (S/P/J/A/W)
  *   - [[FunctionOps]]    scalar-function battery (F-group)
  *   - [[PipelineOps]]    the user-activity-shaped multiway metrics pipeline
  *   - [[EventOps]]       weekly event rollups, sessionization, JSON props
  *   - [[TextOps]]        dedup/text-analysis over `documents`
  *   - [[VectorOps]]      ANN + LSH/MinHash/SimHash over `embeddings`
  *
  * EVERY declared query has a DuckDB oracle in [[oracleSql]] — zero
  * rows-only entries (since round 6; the sketch queries verify through
  * split-column semi-oracles, v5 through the md5-prefix hash). Oracle
  * authoring rule from the round-7 postmortem: any aggregate over an
  * integer column must be CAST AS BIGINT in the SQL — DuckDB's SUM
  * returns HUGEINT, which hash-diverges from Spark's int64 through the
  * driver's arrow canonicalization even when the values are equal.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PipelineOps.queries("j3_weekly_metrics")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++
      FunctionOps.queries ++
      PipelineOps.queries ++
      EventOps.queries ++
      TextOps.queries ++
      VectorOps.queries ++
      MultimodalOps.queries ++
      UserActivityFull.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * xxhash64-based LSH family) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    RelationalOps.oracles ++
      FunctionOps.oracles ++
      PipelineOps.oracles ++
      EventOps.oracles ++
      TextOps.oracles ++
      VectorOps.oracles ++
      MultimodalOps.oracles ++
      UserActivityFull.oracles
}
