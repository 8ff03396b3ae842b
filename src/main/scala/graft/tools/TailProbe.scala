package graft.tools

import org.apache.spark.sql.SparkSession

/** Fixed-cost decomposition of the sub-second tail (r14 verdict ask #7):
  * for the named queries (or a default cheap set), separates per-query
  * CONSTRUCTION time (query function call: plan assembly + any eager
  * actions) from EXECUTION (count()), averaged over reps after a warmup
  * pass — the measurement that says whether the tail's floor is plan
  * construction (hunt eager actions), codegen/scheduling (leave it), or
  * data work. Usage: runMain graft.tools.TailProbe [reps] [q1 q2 ...]
  */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else
        Seq(
          "f11_strings", "j9_asof_union_window", "f1_dates", "f6_date_spine",
          "e2_sessionize", "j12_scd_lookup", "e27_debounce", "j7_explode_outer",
          "e5_approx_distinct", "e29_abandonment", "a8_group_minmax",
          "e1_weekly_activity", "j8_map_lookup", "e9_conversion_lag",
          "s1_scan_project", "p2_derived_week"
        )
    val spark = SparkSession.builder
      .master("local[32]")
      .appName("tail-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warmup: one full pass so janino/JIT is charged to nobody
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, d).count()
      catch { case e: Throwable => println(s"WARMUP $n failed: ${e.getMessage}") }
      spark.catalog.clearCache()
    }
    var consSum = 0.0
    var execSum = 0.0
    for (n <- names) {
      var cons = Double.MaxValue
      var exec = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, d)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        cons = math.min(cons, (t1 - t0) / 1e9)
        exec = math.min(exec, (t2 - t1) / 1e9)
        spark.catalog.clearCache()
      }
      consSum += cons; execSum += exec
      println(f"TAIL $n%-26s cons=$cons%6.3f exec=$exec%6.3f")
    }
    println(f"TAIL TOTAL cons=$consSum%6.3f exec=$execSum%6.3f over ${names.size} queries (min of $reps)")
    spark.stop()
  }
}
