package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** SQL-facing catalog surface: every capability in this engine is a Scala
  * entry point in [[SparkEntry.queries]]; this object makes the same
  * surface reachable from `spark.sql(...)` — the way an analyst (or a BI
  * tool) would consume it.
  *
  * [[register]] exposes, for one corpus directory:
  *   - the base tables as temp views under their bare names (`documents`,
  *     `events`, `embeddings`, the TPC-H-ish star) — `events` through
  *     [[Tables.events]]' timestamp normalization, so SQL users inherit
  *     the same schema discipline as the Scala API;
  *   - the `graft_*` custom expressions, callable from SQL directly
  *     (`SELECT graft_gram_embed(text) FROM documents`);
  *   - any requested declared pipelines as `graft_<name>` views.
  *
  * Pipelines are registered BY NAME, not wholesale: a temp view is built
  * from the pipeline's DataFrame, and several declared entries do eager
  * planning-time work when constructed (bounded model fits like IVF
  * centroids, observability log actions, persisted-store builds) — a
  * blanket register-all would run 178 of those up front for views the
  * session may never read. The views themselves stay lazy: registering a
  * pipeline costs its plan construction, execution happens on first
  * query. GraftSqlSpec smoke-tests ua_full + t3 + v6 + m7b end-to-end
  * through `spark.sql` and pins result equality against the Scala calls.
  */
object GraftCatalog {

  private val baseTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings"
  )

  /** Register the base tables + `graft_*` functions + the named declared
    * pipelines (as `graft_<name>` views) for SQL access over `dir`. */
  def register(
      spark: SparkSession,
      dir: String,
      pipelines: Seq[String] = Nil
  ): Unit = {
    graft.functions.GraftFunctions.register(spark)
    baseTables.foreach { name =>
      Tables.table(spark, dir, name).createOrReplaceTempView(name)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
    pipelines.foreach(registerPipeline(spark, dir, _))
  }

  /** Expose one declared pipeline as the temp view `graft_<name>` —
    * rejects unknown names with the catalog's key set in the error. */
  def registerPipeline(spark: SparkSession, dir: String, name: String): Unit = {
    val fn = SparkEntry.queries.getOrElse(
      name,
      throw new IllegalArgumentException(
        s"unknown pipeline '$name'; declared: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"
      )
    )
    fn(spark, dir).createOrReplaceTempView(s"graft_$name")
  }
}
