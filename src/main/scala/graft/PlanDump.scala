package graft

import org.apache.spark.sql.SparkSession

// scratch plan-inspection main (gitignored)
object PlanDump {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "v12b_semantic_clusters_banded"
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("=== ReusedExchange nodes: " + p.linesIterator.count(_.contains("ReusedExchange")))
    println("=== Exchange nodes: " + p.linesIterator.count(_.trim.startsWith("+- Exchange") || p.linesIterator.isEmpty))
    println("=== graft_dot occurrences: " + "graft_dot".r.findAllIn(p).size)
    println("=== InMemoryTableScan: " + p.linesIterator.count(_.contains("InMemoryTableScan")))
    println(p.linesIterator.take(120).mkString("\n"))
    spark.stop()
  }
}
