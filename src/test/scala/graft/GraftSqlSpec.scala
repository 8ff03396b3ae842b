package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-surface gate: the declared catalog is reachable from
  * `spark.sql(...)` with results identical to the Scala entry points —
  * base tables under bare names, `graft_*` expressions callable in SQL,
  * and named pipelines as `graft_<name>` views.
  */
class GraftSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  test("ua_full + t3 + v6 + m7b run through spark.sql with results equal to the Scala calls") {
    GraftCatalog.register(
      spark,
      sf,
      pipelines = Seq(
        "ua_full_pipeline",
        "t3_dedup_exact",
        "v6_ann_ivf",
        "m7b_semantic_dedup_banded",
        "t61_phrase_search",
        "j10b_concurrency_profile",
        "t65_suffix_ranks",
        "v35_logreg_fit",
        "v37_bm25_topk",
        "t65b_suffix_ranks_l50",
        "t68_exactsubstr_rewrite",
        "t69_residual_dup_audit",
        "t59_dedup_provenance"
      )
    )
    for (
      name <- Seq(
        "ua_full_pipeline",
        "t3_dedup_exact",
        "v6_ann_ivf",
        "m7b_semantic_dedup_banded",
        "t61_phrase_search",
        "j10b_concurrency_profile",
        "t65_suffix_ranks",
        "v35_logreg_fit",
        "v37_bm25_topk",
        "t65b_suffix_ranks_l50",
        "t68_exactsubstr_rewrite",
        "t69_residual_dup_audit",
        "t59_dedup_provenance"
      )
    ) {
      val viaSql = rows(spark.sql(s"SELECT * FROM graft_$name"))
      val viaScala = rows(SparkEntry.queries(name)(spark, sf))
      assert(viaSql.nonEmpty, s"$name returned nothing through SQL")
      assert(viaSql == viaScala, s"$name: SQL view diverged from the Scala entry")
    }
  }

  test("base tables and graft_* expressions compose in ad-hoc SQL") {
    GraftCatalog.register(spark, sf)
    // an analyst-style query: custom expression + base view + join
    val top = spark
      .sql(
        """SELECT d.source, count(*) AS n,
             sum(size(graft_gram_embed(d.text))) AS dims
           FROM documents d
           JOIN embeddings e ON e.vec_id = d.doc_id
           GROUP BY d.source ORDER BY n DESC, d.source LIMIT 3"""
      )
      .collect()
    assert(top.nonEmpty)
    assert(top.forall(r => r.getLong(2) == r.getLong(1) * 64), "graft_gram_embed not callable from SQL")
    // events view carries the normalized timestamp schema
    val tsType = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType
    assert(tsType == org.apache.spark.sql.types.TimestampType)
  }

  test("registering an unknown pipeline fails with the catalog listed") {
    val e = intercept[IllegalArgumentException] {
      GraftCatalog.registerPipeline(spark, sf, "no_such_query")
    }
    assert(e.getMessage.contains("no_such_query") && e.getMessage.contains("t3_dedup_exact"))
  }
}
