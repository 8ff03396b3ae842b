package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Spike forensics for ua_full_pipeline: per-rep, separates query
  * CONSTRUCTION (plan build + any eager actions) from EXECUTION, and
  * captures per-job wall times so a spiked rep shows WHERE the time went
  * (one slow job = stage-level problem; all jobs slow = box/GC; no jobs
  * running = driver/planning). Usage: runMain graft.tools.UaProbe2 [reps]
  */
object UaProbe2 {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder
      .master("local[32]")
      .appName("ua-probe2")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (j.time, -1L))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val v = jobs.get(j.jobId)
        if (v != null) jobs.put(j.jobId, (v._1, j.time))
      }
    })
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s
    }
    for (r <- 1 to reps) {
      jobs.clear()
      val g0 = gcMs
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("ua_full_pipeline")(spark, d)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      val g1 = gcMs
      val wall = (t2 - t0) / 1e9
      val cons = (t1 - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      val jtimes = js.map { case (_, (s, e)) => if (e > 0) (e - s) / 1e3 else -1.0 }
      val busy = js.filter(_._2._2 > 0)
      val jobSpan =
        if (busy.nonEmpty) (busy.map(_._2._2).max - busy.map(_._2._1).min) / 1e3 else 0.0
      println(
        f"REP $r%2d wall=$wall%6.2f cons=$cons%5.2f gc=${(g1 - g0) / 1e3}%5.2f " +
          f"njobs=${js.size} jobspan=$jobSpan%6.2f jobs=" +
          jtimes.map(t => f"$t%.1f").mkString(",")
      )
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
