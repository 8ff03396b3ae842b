package graft.tools

import org.apache.spark.sql.SparkSession

/** Times any declared query twice in one session (2nd run separates janino
  * compile + scan-cache warmup from steady-state execution — the number
  * that matters for plan decisions; see the v10/v11 outlier lesson).
  * Usage: runMain graft.tools.ProfileQuery <query> [query ...]
  * (SPARK_GRAFT_SF_DIR to change the input, default sf0.1.)
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder
      .master("local[32]")
      .appName("profile-query")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional session confs (comma-separated k=v), e.g. the suffix
    // family's reliable-checkpoint mode for overhead measurements
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args; rnd <- 1 to 2) {
      val s = System.nanoTime
      val n = graft.SparkEntry.queries(q)(spark, d).collect().length
      println(f"PROFILE $q%-28s run$rnd ${(System.nanoTime - s) / 1e9}%7.3f s  ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
