package graft.tools

import org.apache.spark.sql.SparkSession

/** SCALING.md runner for the round-11 m7d store-backed probe: time the
  * refit probe vs the probe reading a persisted VectorIndexStore's
  * centroid table on the same corpus (store built at the probe's own
  * list count, so the two paths agree exactly — spec-pinned).
  *
  * Usage: runMain graft.tools.M7dStoreRun <sfDir>
  */
object M7dStoreRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ops = graft.multimodal.MultimodalOps
    val emb = ops
      .gramEmbeddings(spark.read.parquet(s"$sfDir/documents.parquet"))
      .select("vec_id", "embedding")
    val nLists = math.min(256L, math.max(32L, emb.count() / 2000L)).toInt
    val tB0 = System.nanoTime()
    graft.operators.VectorIndexStore.write(emb, "m7d_run_store", nLists)
    val buildSec = (System.nanoTime() - tB0) / 1e9
    def timed(): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = ops.ivfProbeDecisionQuery(spark, sfDir).collect()
      ((System.nanoTime() - t0) / 1e9, rows(0).getLong(0))
    }
    val (refitSec, nRefit) = timed()
    spark.conf.set("spark.graft.m7d.store", "m7d_run_store")
    val (storeSec, nStore) = timed()
    require(nRefit == nStore, s"probe disagreement: $nRefit vs $nStore")
    println(
      s"""{"tool":"m7d_store","sf":"$sfDir","n_lists":$nLists,""" +
        s""""store_build_sec":${f"$buildSec%.1f"},""" +
        s""""refit_sec":${f"$refitSec%.1f"},"store_sec":${f"$storeSec%.1f"}}""")
    spark.stop()
  }
}
