package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.GraftFunctions
import graft.sources.Tables

/** SQL-first entry point: registers every testdata table as a temp view and
  * the native graft functions on the session, so a user of the reference —
  * whose workflow is "write SQL against named tables" — can keep doing
  * exactly that:
  *
  * {{{
  *   GraftSession.registerAll(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
  *   spark.sql("SELECT graft_dot(a.embedding, b.embedding) FROM embeddings a, embeddings b")
  * }}}
  */
object GraftSession {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def registerAll(spark: SparkSession, dir: String): Unit = {
    GraftFunctions.register(spark)
    tableNames.foreach {
      // events needs the nanos-timestamp conversion path
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }
}
