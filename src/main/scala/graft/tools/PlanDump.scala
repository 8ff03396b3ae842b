package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"===== $q")
      val p = graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      println(p.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Scan parquet") ||
        l.contains("Window") || l.contains("HashAggregate") || l.contains("Reused") || l.contains("InMemory")).mkString("\n"))
    }
    spark.stop()
  }
}
