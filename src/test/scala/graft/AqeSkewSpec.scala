package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RelationalOps

/** The second belt of SURVEY §7.4 item 5: j6_salted_skew shows the MANUAL
  * two-level salted plan; this spec pins that Spark's AQE runtime skew
  * handling also engages on a genuinely skewed fixture — so a plan that was
  * NOT hand-salted still doesn't funnel a hot key through one reducer.
  *
  * AQE splits skewed partitions of a sort-merge join at runtime; the
  * thresholds are lowered here (advisory size / skew threshold in KB, not
  * the production 64 MB/256 MB) because the fixture is MB-scale — the same
  * mechanism at defaults is what handles a hot key at 100 TB.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed side of an unsalted sort-merge join at runtime") {
    import spark.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // keep AQE from collapsing the whole join to a broadcast instead
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false"
    ) {
      // 50k rows, 90% on one hot key, ~100B payload each => the hot
      // reducer partition is ~30x the median and well past the threshold
      val left = spark
        .range(0, 50000)
        .select(
          when(col("id") % 10 < 9, lit("HOT"))
            .otherwise(concat(lit("k"), col("id") % 100))
            .as("k"),
          concat(lit("payload-"), col("id"), lit("x" * 80)).as("v")
        )
      val right = spark
        .range(0, 200)
        .select(
          when(col("id") === 0, lit("HOT"))
            .otherwise(concat(lit("k"), col("id") % 100))
            .as("k"),
          col("id").as("r")
        )
      // the downstream aggregate is GLOBAL (no hash requirement on k):
      // OptimizeSkewedJoin declines to split when a later operator needs
      // the join's hashpartitioning intact — which is itself the documented
      // trade (keep partitioning vs split the straggler)
      val joined = left
        .join(right, "k")
        .agg(sum(length(col("v"))).as("total_bytes"))
      joined.collect() // AQE finalizes the plan only on execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(
        plan.contains("skew=true"),
        s"AQE skew split did not engage:\n$plan"
      )
    }
  }

  test("v17's cid list join: AQE splits a hot inverted list at runtime") {
    // The open risk named at VectorOps.knnGraph: the kNN-graph list join
    // keys both sides on cid, and a hot list (many vectors in one coarse
    // cluster) funnels through one reducer unless AQE splits it. Fixture:
    // seeds (vec_id 0..15) scattered, 90% of the remaining vectors in ONE
    // tight blob => exactly one centroid captures the blob and its list
    // holds ~1800 of 2000 vectors — the worst-case cid distribution.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    def scattered() = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val blobBase = Array.fill(64)(rnd.nextFloat() * 0.2f + 0.4f)
    val emb = (0 until 2000).map { i =>
      val v =
        if (i < 16 || i % 10 == 9) scattered()
        else blobBase.map(x => x + rnd.nextFloat() * 0.01f)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val baseline = graft.operators.VectorOps.knnGraph(emb).count()
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // at 100 TB the index side does not broadcast — force the shuffle join
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false"
    ) {
      val g = graft.operators.VectorOps.knnGraph(emb)
      // collect() (not count()) so THIS queryExecution runs — AQE
      // finalizes the inspected plan only when it itself executes
      val n = g.collect().length.toLong
      val plan = g.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"hot-list skew split did not engage:\n$plan")
      assert(n == baseline, s"skew split changed the result: $n vs $baseline")
    }
  }

  test("j6_salted_skew pre-shuffles on (key, salt) so the hot key fans out") {
    val df = RelationalOps.queries("j6_salted_skew")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the first Exchange must key on the salted pair, not nation_group alone
    assert(
      plan.contains("hashpartitioning(nation_group") && plan.contains("salt"),
      s"salted two-level agg lost its salt partitioning:\n$plan"
    )
  }
}
