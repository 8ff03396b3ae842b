package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Within-list background probe for the IVF-pruned banding lever
  * (SCALING.md round 9): measures the cosine distribution of
  * hash-ordered neighbor pairs INSIDE each coarse IVF list, against the
  * corpus-wide background the band solver's random-sign model assumes.
  * Sign-LSH candidate pruning lives off the gap between the true-pair
  * per-bit agreement p(τ) and the background's; k-means clustering
  * compresses exactly that gap (members share the centroid direction),
  * and this probe puts a number on the compression at each scale —
  * the measurement that adjudicates whether any in-list geometry can
  * prune candidates affordably.
  *
  * Sampling is deterministic: members of each (probed) list are ranked
  * by xxhash64(vec_id, cid) and each pairs with its next `S` neighbors
  * in hash order — hash order is unstructured, so neighbor pairs are
  * uniform-ish list pairs without an all-pairs join. Output: one JSON
  * line with quantiles of the within-list pair cosine, the implied
  * per-bit agreement p = 1 − acos(cos)/π at each quantile, and E[p^b]
  * for the candidate bit widths (the exact expected per-band collision
  * rate the solver needs, estimated on the sample).
  *
  * Usage: runMain graft.tools.ListBgProbe <sfDir> [nLists] [probes] [S]
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
      graft.functions.GraftFunctions.register(spark)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val emb = graft.multimodal.MultimodalOps.gramEmbeddings(docs).cache()
      val n = emb.count()
      val nLists =
        if (args.length > 1) args(1).toInt
        else math.min(256L, math.max(4L, n / 2000L)).toInt
      val probes = if (args.length > 2) args(2).toInt else 3
      val s = if (args.length > 3) args(3).toInt else 4
      val cents = graft.operators.IvfAnn.collectCents(
        graft.operators.IvfAnn.centroids(emb.select(col("vec_id"), col("embedding")), nLists)
      )
      val probed = graft.operators.IvfAnn
        .withProbedCids(cents, "embedding", probes = probes)(
          emb.select("vec_id", "embedding", "nrm")
        )
        .cache()
      val w = Window.partitionBy("cid").orderBy(col("hk"))
      val ranked = probed.withColumn("hk", xxhash64(col("vec_id"), col("cid")))
      val pairs = (1 to s)
        .map { k =>
          ranked
            .withColumn("eb", lead(col("embedding"), k).over(w))
            .withColumn("nb", lead(col("nrm"), k).over(w))
            .filter(col("eb").isNotNull)
            .select(
              (call_function("graft_dot", col("embedding"), col("eb")) /
                (col("nrm") * col("nb"))).as("cos")
            )
        }
        .reduce(_ unionAll _)
        .withColumn("p", lit(1.0) - acos(least(lit(1.0), greatest(lit(-1.0), col("cos")))) / lit(math.Pi))
        .cache()
      val m = pairs.count()
      val qs = pairs.stat.approxQuantile("cos", Array(0.5, 0.9, 0.99, 0.999, 1.0), 1e-4)
      val bitRange = Seq(8, 11, 14, 17, 20, 24)
      val epb = pairs
        .agg(
          bitRange.map(b => avg(pow(col("p"), b)).as(s"b$b")).head,
          bitRange.map(b => avg(pow(col("p"), b)).as(s"b$b")).tail: _*
        )
        .first()
      // corpus-wide contrast: same neighbor-pair trick without cid
      val gw = Window.orderBy(col("hk"))
      val granked = emb.withColumn("hk", xxhash64(col("vec_id"))).repartition(1)
      val gpairs = granked
        .withColumn("eb", lead(col("embedding"), 1).over(gw))
        .withColumn("nb", lead(col("nrm"), 1).over(gw))
        .filter(col("eb").isNotNull)
        .select(
          (call_function("graft_dot", col("embedding"), col("eb")) /
            (col("nrm") * col("nb"))).as("cos")
        )
        .withColumn("p", lit(1.0) - acos(least(lit(1.0), greatest(lit(-1.0), col("cos")))) / lit(math.Pi))
        .cache()
      val gqs = gpairs.stat.approxQuantile("cos", Array(0.5, 0.9, 0.99, 1.0), 1e-4)
      val gepb = gpairs
        .agg(
          bitRange.map(b => avg(pow(col("p"), b)).as(s"g$b")).head,
          bitRange.map(b => avg(pow(col("p"), b)).as(s"g$b")).tail: _*
        )
        .first()
      val listPop = probes.toLong * n / nLists
      println(
        s"""{"n":$n,"nLists":$nLists,"probes":$probes,"samplePairs":$m,"listPop":$listPop,""" +
          s""""inListCosQ50_90_99_999_max":[${qs.mkString(",")}],""" +
          s""""inListEpb":{${bitRange.zipWithIndex.map { case (b, i) => s""""$b":${epb.getDouble(i)}""" }.mkString(",")}},""" +
          s""""corpusCosQ50_90_99_max":[${gqs.mkString(",")}],""" +
          s""""corpusEpb":{${bitRange.zipWithIndex.map { case (b, i) => s""""$b":${gepb.getDouble(i)}""" }.mkString(",")}}}"""
      )
    } finally spark.stop()
  }
}
