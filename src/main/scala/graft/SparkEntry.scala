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
  * Every query with SQL-expressible semantics has a DuckDB oracle in
  * [[oracleSql]]; the two remaining rows-only queries (v5 SimHash on
  * xxhash64, e5 on an HLL sketch) are engine-specific by construction and
  * verified against their exact counterparts in ScalaTest.
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
