package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.export.ShardStore
import graft.operators.TextOps
import graft.sources.Tables

/** E2E pin for the materialized shard sink: the corpus→shards pipeline's
  * assignments land in a split-partitioned, doc_id-bucketed table, and the
  * readback enrichment join to a co-bucketed corpus runs with ZERO shuffle
  * exchanges and directory-level split pruning — the composition of the
  * two layout techniques ScaleTechniquesSpec proves in isolation, applied
  * to the real packing pipeline's output.
  */
class ShardSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("shard assignments write partitioned+bucketed and read back joining zero-shuffle") {
    val assignments = TextOps.queries("t25_corpus_to_shards")(spark, sf)
    ShardStore.write(assignments, "shards_sink_t", buckets = 8)
    ShardStore.writeCorpus(Tables.documents(spark, sf), "corpus_sink_t", buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // written layout: one directory per split under the table root
      val loc = spark
        .sql("DESCRIBE TABLE EXTENDED shards_sink_t")
        .filter(col("col_name") === "Location")
        .head()
        .getString(1)
        .stripPrefix("file:")
      val splits = new java.io.File(loc)
        .listFiles()
        .filter(_.isDirectory)
        .map(_.getName)
        .filter(_.startsWith("split="))
        .toSet
      assert(splits == Set("split=train", "split=valid", "split=test"), splits)

      val q = ShardStore.readSplitWithText(spark, "shards_sink_t", "corpus_sink_t", "train")
      val p = q.queryExecution.executedPlan.toString
      // split selection is directory pruning, not a scan-and-filter
      assert("PartitionFilters: \\[[^\\]]*split".r.findFirstIn(p).isDefined, p)
      // co-bucketed layout: the join consumes both scans without ANY
      // repartitioning — neither the corpus nor the assignments reshuffle
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"), s"bucketing did not eliminate the shuffle:\n$p")

      // and the enriched readback is the pipeline's own train split, intact
      val expected = assignments.filter(col("split") === "train").count()
      assert(q.count() == expected && expected > 0)
      assert(q.filter(col("text").isNull).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS shards_sink_t")
      spark.sql("DROP TABLE IF EXISTS corpus_sink_t")
    }
  }
}
