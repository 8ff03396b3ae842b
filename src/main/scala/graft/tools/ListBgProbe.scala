package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc runner for the IVF go/no-go decision probe — a thin wrapper
  * over the DECLARED `m7d_ivf_probe_decision` query so there is exactly
  * ONE instrument answering the m7b-vs-m7c question (round 10: the
  * original standalone sweep here used drifted constants — nLists floor
  * 4 vs m7c's 32, probes 3 vs 4, xxhash64 vs md5 ordering — so a tool
  * reading could disagree with the oracle-checked row; now it cannot).
  * The round-9 bit-width sweep this tool once printed is superseded by
  * the solver's own measured solve (`VectorOps.inListNeighborEpb` →
  * `bandGeometryMeasured`) and by the declared row's fixed b=14 anchor.
  *
  * Usage: runMain graft.tools.ListBgProbe <sfDir>
  */
object ListBgProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .appName("graft-list-bg-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val row = graft.multimodal.MultimodalOps
        .ivfProbeDecisionQuery(spark, sfDir)
        .collect()(0)
      val fields = row.schema.fields.map(_.name)
      println(
        fields
          .zipWithIndex
          .map { case (f, i) =>
            val v = row.get(i)
            val rendered = v match {
              case b: Boolean => b.toString
              case n: Number => n.toString
              case other => "\"" + String.valueOf(other) + "\""
            }
            s""""$f":$rendered"""
          }
          .mkString("{", ",", "}")
      )
    } finally spark.stop()
  }
}
