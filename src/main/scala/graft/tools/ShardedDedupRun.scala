package graft.tools

import org.apache.spark.sql.SparkSession

/** SCALING.md runner for m7e (band-sharded semantic dedup): one timed
  * run at a given fixture + shard count, peak-disk-bounded by design —
  * the measurement that turns round 10's sf30 one-shot disk death into
  * a completed run on the same box.
  *
  * Usage: runMain graft.tools.ShardedDedupRun <sfDir> <shards>
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE, SPARK_DRIVER_MEM (sbt),
  * SPARK_LOCAL_DIRS (dedicated spill dir, cleaned between runs).
  */
object ShardedDedupRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val shards = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scratch = java.nio.file.Files.createTempDirectory("m7e-run").toString
    val t0 = System.nanoTime()
    val nPairs = graft.multimodal.MultimodalOps
      .semanticDedupBandedSharded(spark, sfDir, shards, Some(scratch))
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(
      s"""{"tool":"sharded_dedup","sf":"$sfDir","shards":$shards,""" +
        s""""n_pairs":$nPairs,"sec":${f"$sec%.1f"}}""")
    spark.stop()
  }
}
