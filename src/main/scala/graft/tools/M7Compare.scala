package graft.tools

import org.apache.spark.sql.SparkSession

/** m7b (banded) vs m7c (ivf+banded) certification runner for the scales
  * the ScalaTest gate can't reach (sf1/sf10): runs both declared queries
  * on a sf dir, times them, and compares the full pair SETS (collected —
  * pairs are linear and small: 2.5k at sf1, 25.6k at sf10). One JSON
  * line: times, pair counts, and the symmetric difference (must be 0 for
  * the SCALING.md per-scale certification).
  *
  * Usage: runMain graft.tools.M7Compare <sfDir> [probes] [refParquet]
  *
  * `probes` overrides m7c's multi-probe count (default: the declared
  * query's). `refParquet`, if given, caches m7b's pair set on disk: read
  * when present, computed-and-written when absent — so probe-count
  * sweeps at a multi-minute scale pay the exact arm once.
  */
object M7Compare {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probesOpt = if (args.length > 1) Some(args(1).toInt) else None
    val refPath = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .appName("graft-m7-compare")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def timed(df: => org.apache.spark.sql.DataFrame): (Set[(Long, Long, Double)], Double) = {
        val t0 = System.nanoTime()
        val rows = df
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSet
        val secs = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (rows, math.round(secs * 10) / 10.0)
      }
      val (b, tb) = refPath match {
        case Some(p) if new java.io.File(p).exists() =>
          (
            spark.read
              .parquet(p)
              .collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
              .toSet,
            0.0
          )
        case other =>
          val r = timed(
            graft.multimodal.MultimodalOps.semanticDedupBandedQuery(spark, sfDir)
          )
          other.foreach(p =>
            spark
              .createDataFrame(r._1.toSeq.map(t => (t._1, t._2, t._3)))
              .toDF("id_a", "id_b", "cos")
              .coalesce(1)
              .write
              .parquet(p)
          )
          r
      }
      val (c, tc) = timed(probesOpt match {
        case Some(pr) => graft.multimodal.MultimodalOps.semanticDedupIvf(spark, sfDir, pr)
        case None     => graft.multimodal.MultimodalOps.queries("m7c_semantic_dedup_ivf")(spark, sfDir)
      })
      val missed = (b -- c).size
      val extra = (c -- b).size
      println(
        s"""{"sf":"$sfDir","m7b_pairs":${b.size},"m7b_secs":$tb,""" +
          s""""m7c_pairs":${c.size},"m7c_secs":$tc,""" +
          s""""missed":$missed,"extra":$extra,"equal":${missed == 0 && extra == 0}}"""
      )
    } finally spark.stop()
  }
}
