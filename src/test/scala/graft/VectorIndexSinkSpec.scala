package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfAnn, VectorIndexStore}
import graft.sources.Tables

/** E2E pin for the materialized IVF index: build-once-probe-many must
  * (a) lay the inverted lists out as one directory per list, (b) plan the
  * probe as partition pruning + a broadcast join — the index side never
  * shuffles and unprobed lists are never opened — and (c) return exactly
  * what the inline v10 serving query returns on the same data, proving
  * the persisted index is the same index. */
class VectorIndexSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("IVF index writes one directory per list and probes via partition pruning") {
    val emb = Tables.embeddings(spark, sf)
    VectorIndexStore.write(emb, "ivf_index_t")
    try {
      // layout: cid=<list> directories under the table root
      val loc = spark
        .sql("DESCRIBE TABLE EXTENDED ivf_index_t")
        .filter(col("col_name") === "Location")
        .head()
        .getString(1)
        .stripPrefix("file:")
      val lists = new java.io.File(loc)
        .listFiles()
        .filter(_.isDirectory)
        .map(_.getName)
        .count(_.startsWith("cid="))
      assert(lists > 0 && lists <= IvfAnn.k, s"unexpected list layout: $lists dirs")

      val queries = emb.filter(col("vec_id") < 10).select("vec_id", "embedding")
      val result = VectorIndexStore.probe(spark, "ivf_index_t", queries)

      val p = result.queryExecution.executedPlan.toString
      // probed lists are pruned at the directory level, not scan-filtered
      assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p).isDefined,
        s"probe lost partition pruning:\n$p")
      // the index side joins against the broadcast probe set — a
      // sort-merge here would reshuffle every stored list
      assert(p.contains("BroadcastHashJoin"), s"probe join lost its broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"index side got shuffled:\n$p")

      // the materialized index answers exactly like the inline build
      val expected = IvfAnn.queryQuantized(spark, sf).collect().toSeq
      assert(result.collect().toSeq == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_index_t")
      spark.sql("DROP TABLE IF EXISTS ivf_index_t_centroids")
    }
  }
}
