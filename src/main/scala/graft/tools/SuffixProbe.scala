package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timer for the t65 stages: rank-table build (the checkpointed
  * doubling rounds) vs the consumer aggregations. Usage:
  * runMain graft.tools.SuffixProbe <sfDir> [shuffle=32]
  */
object SuffixProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val shuffle = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime
      val r = f
      println(f"[probe] $label: ${(System.nanoTime - s) / 1e9}%.2f s")
      r
    }
    // replicate the build with per-round timers + ambiguity census (same
    // ops as TextOps.suffixRankTable — keep in sync when probing): the
    // settled-rank refinement's payoff is exactly the amb fraction's
    // collapse, so the probe reports it per round
    {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val words = graft.sources.Tables
        .documents(spark, dir)
        .select(col("doc_id"), filter(split(trim(col("text")), "\\s+"), x => length(x) > 0).as("w"))
      val tokpos = words
        .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
          posexplode(col("w")).as(Seq("p0", "tok")))
        .select(col("doc_id"), col("n_tokens"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
      val tp = tokpos.localCheckpoint()
      val wdoc = Window.partitionBy("doc_id").orderBy("pos")
      val wGrp = Window.partitionBy("r")
      var cur = tp
        .join(graft.operators.TextOps.orderIds(tp.select("tok"), Seq("tok")), "tok")
        .select(col("doc_id"), col("n_tokens"), col("pos"), col("rank_id").as("r"))
        .withColumn("amb", count(lit(1)).over(wGrp) > 1)
      var step = 1
      while (step * 2 < 16) {
        val paired = t(s"round step=$step paired checkpoint")(
          cur.withColumn("rn", coalesce(lead("r", step).over(wdoc), lit(0L))).localCheckpoint())
        val nAll = paired.count()
        val nAmb = paired.filter(col("amb")).count()
        println(f"[probe] round step=$step ambiguity: $nAmb / $nAll (${100.0 * nAmb / nAll}%.1f%%)")
        val ambRows = paired.filter(col("amb"))
        val tagged = graft.operators.TextOps
          .orderIds(ambRows.select("r", "rn"), Seq("r", "rn"))
          .withColumn("rank_id",
            col("rank_id") + lit(graft.operators.TextOps.suffixRoundTag(step)))
        val rekeyed = ambRows
          .join(tagged, Seq("r", "rn"))
          .select(col("doc_id"), col("n_tokens"), col("pos"), col("rank_id").as("r"))
          .withColumn("amb", count(lit(1)).over(wGrp) > 1)
        cur = rekeyed
          .select("doc_id", "n_tokens", "pos", "r", "amb")
          .union(paired.filter(!col("amb"))
            .select(col("doc_id"), col("n_tokens"), col("pos"), col("r"), col("amb")))
        step *= 2
      }
      t("final pair checkpoint")(
        cur.withColumn("rn", coalesce(lead("r", 16 - step).over(wdoc), lit(0L)))
          .drop("amb").localCheckpoint())
    }
    val rt = t("rank table build (memoized: first call pays)") {
      graft.operators.TextOps.suffixRankTable(spark, dir)
    }
    t("rank table count")(rt.count())
    t("t65 consumer agg") {
      graft.SparkEntry.queries("t65_suffix_ranks")(spark, dir).write
        .mode("overwrite").format("noop").save()
    }
    t("t66 consumer agg") {
      graft.SparkEntry.queries("t66_repeated_spans")(spark, dir).write
        .mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
