package graft.export

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized training-shard store — the sink half of the
  * corpus→shards pipelines (t9/t25/t26), which compute shard/split/sequence
  * assignments but need a LAYOUT for them to be worth anything downstream.
  * Extension analogue of the reference's partitioned truncate sink
  * (`/root/reference/public_data_report/hardware_report/hardware_report.py:459-465`):
  * the reference truncates and rewrites a date-partitioned BigQuery table;
  * this writes a split-partitioned, id-bucketed Spark table.
  *
  * Layout choices, both load-bearing at 100 TB:
  *   - `partitionBy(split)`: train/valid/test selection is directory
  *     pruning — an evaluation job never scans training shards.
  *   - `bucketBy(doc_id) + sortBy(doc_id)`: joining assignments back to a
  *     co-bucketed corpus (the enrichment every shard EXPORT does — the
  *     assignment table carries ids and offsets, the corpus carries text)
  *     is a zero-Exchange sort-merge join; neither the multi-TB corpus nor
  *     the assignment table reshuffles. ScaleTechniquesSpec proves the two
  *     techniques in isolation; ShardSinkSpec pins this composition e2e.
  */
object ShardStore {

  /** Write a shard-assignment table (must carry `split` and `doc_id`
    * columns) as a split-partitioned, doc_id-bucketed table. Overwrite
    * semantics: the whole logical table is replaced per run — the batch
    * equivalent of the reference's truncate-then-load. */
  def write(assignments: DataFrame, table: String, buckets: Int = 8): Unit = {
    assignments.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    assignments.write
      .partitionBy("split")
      .bucketBy(buckets, "doc_id")
      .sortBy("doc_id")
      .saveAsTable(table)
  }

  /** Write the corpus co-bucketed with [[write]]'s layout so the
    * enrichment join is shuffle-free. At production scale this is how the
    * corpus is stored ONCE; every downstream shard export then rides the
    * shared bucketing. */
  def writeCorpus(documents: DataFrame, table: String, buckets: Int = 8): Unit = {
    documents.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    documents.write
      .bucketBy(buckets, "doc_id")
      .sortBy("doc_id")
      .saveAsTable(table)
  }

  /** The readback enrichment: one split's assignments (directory-pruned)
    * joined to the co-bucketed corpus — zero Exchange by layout. */
  def readSplitWithText(
      spark: SparkSession,
      assignmentsTable: String,
      corpusTable: String,
      split: String
  ): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark
      .table(assignmentsTable)
      .filter(col("split") === split)
      .join(spark.table(corpusTable).select("doc_id", "text"), "doc_id")
  }
}
