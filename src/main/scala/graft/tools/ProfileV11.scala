package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.{IvfAnn, PqAnn}

/** Throwaway steady-state profiler for the ANN family (not part of the
  * library surface): two rounds so round 2 reads past janino/JIT warmup. */
object ProfileV11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder
      .master("local[32]")
      .appName("profile-v11")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"PHASE $label%-22s ${(System.nanoTime - s) / 1e9}%.3f s"); r
    }

    (1 to 2).foreach { rnd =>
      println(s"--- round $rnd")
      t("v11 pq")(PqAnn.query(spark, d).collect().length)
      t("v11 pq again")(PqAnn.query(spark, d).collect().length)
      t("v6 ivf")(IvfAnn.query(spark, d).collect().length)
      t("v10 ivf quantized")(IvfAnn.queryQuantized(spark, d).collect().length)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
