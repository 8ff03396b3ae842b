package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for SCALING.md's m7b decade-exponent lever: a
  * HIGHER-dimensional `graft_gram_embed` featurizer reduces feature-hash
  * collision noise, lifting the true-pair cosine floor and dropping the
  * background ceiling — which lets [[graft.operators.VectorOps
  * .bandGeometry]] solve at a higher design τ, where per-bit agreement
  * p₁ is larger and the n^ρ signature-width factor (ρ = ln(1/p₁)/ln 2)
  * shrinks. This main measures, at a given sf dir and dims:
  *
  *   1. the corpus GEOMETRY: true-pair cosine floor (min cos over pairs
  *      that the τ=0.8 criterion keeps) and the background ceiling (max
  *      cos over a deterministic non-pair sample) — the inputs the
  *      design-τ choice must respect;
  *   2. the banded pipeline's cost at the solved geometry: plane count,
  *      candidate rows, verified pairs, wall seconds;
  *   3. a banded == exact equality check (crossJoin arm, only run when
  *      the corpus is small enough — pass `exact=1`).
  *
  * Exact pairs here are pairs under the DIMS-PARAMETERIZED criterion
  * (cos of the dims-d embedding > τ): the lever changes the featurizer,
  * and the certification is that banding at the solved geometry loses
  * none of ITS OWN featurizer's pairs. Output: one JSON line.
  *
  * Usage: runMain graft.tools.LeverProbe <sfDir> <dims> <designTau> [exact=0|1]
  */
object LeverProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val dims = args(1).toInt
    val designTau = args(2).toDouble
    val exactArm = args.length > 3 && args(3) == "1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .appName(s"graft-lever-probe-$dims")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      graft.functions.GraftFunctions.register(spark)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val emb = graft.multimodal.Multimodal
        .withPayload(docs)
        .filter(length(col("payload")) > 0)
        .withColumn(
          "embedding",
          call_function("graft_gram_embed", col("payload").cast("string"), lit(dims))
        )
        .withColumn(
          "nrm",
          sqrt(call_function("graft_dot", col("embedding"), col("embedding")))
        )
        .filter(col("nrm") > 0)
        .select(col("media_id").as("vec_id"), col("embedding"), col("nrm"))
        .cache()
      val n = emb.count()
      val (nBands, bandBits) = graft.operators.VectorOps.bandGeometry(
        n, tau = designTau, targetCandPerVec = 256, maxMiss = 1e-6
      )

      val t0 = System.nanoTime()
      val cand = graft.operators.VectorOps.bandedCandidateStream(
        emb.select("vec_id", "embedding"), nBands = nBands, bandBits = bandBits
      )
      val banded = graft.multimodal.MultimodalOps.verifiedPairs(cand, emb).cache()
      val nPairs = banded.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val nCand = cand.count()

      // min over an EMPTY pair set is SQL NULL — report NaN rather than
      // NPE: "no pairs" is a valid probe answer (high tau, clean corpus)
      val floorRow = banded.agg(min("cos")).head
      val floor = if (floorRow.isNullAt(0)) Double.NaN else floorRow.getDouble(0)

      // background ceiling: deterministic sample of non-pair ids (stride
      // pairing i with i+1 in vec_id order collides with true dups rarely;
      // exclude any sampled pair that IS a verified pair)
      val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val seq = emb
        .select(col("vec_id"), col("embedding"), col("nrm"))
        .withColumn("rn", row_number().over(w))
      val bg = seq
        .alias("x")
        .join(seq.alias("y"), col("x.rn") + 1 === col("y.rn"))
        .select(
          col("x.vec_id").as("id_a"),
          col("y.vec_id").as("id_b"),
          (call_function("graft_dot", col("x.embedding"), col("y.embedding")) /
            (col("x.nrm") * col("y.nrm"))).as("cos")
        )
        .join(banded.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
        .agg(max("cos"), expr("percentile(cos, 0.999)"))
        .head
      val bgMax = if (bg.isNullAt(0)) Double.NaN else bg.getDouble(0)
      val bgP999 = if (bg.isNullAt(1)) Double.NaN else bg.getDouble(1)

      var exactOk = "skipped"
      if (exactArm) {
        val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("nrm").as("na"))
        val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"), col("nrm").as("nb"))
        val exact = a
          .crossJoin(broadcast(b))
          .filter(col("id_a") < col("id_b"))
          .withColumn(
            "cos",
            call_function("graft_dot", col("ea"), col("eb")) / (col("na") * col("nb"))
          )
          .filter(col("cos") > 0.8)
          .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        val diff = exact.exceptAll(banded).count() + banded.exceptAll(exact).count()
        exactOk = if (diff == 0) "equal" else s"DIFF=$diff"
      }

      println(
        s"""{"sf":"$sfDir","dims":$dims,"design_tau":$designTau,"n":$n,""" +
          s""""bands":$nBands,"bits":$bandBits,"planes":${nBands * bandBits},""" +
          s""""cand":$nCand,"pairs":$nPairs,"floor":$floor,""" +
          s""""bg_max":$bgMax,"bg_p999":$bgP999,"secs":${math.round(secs * 10) / 10.0},""" +
          s""""exact":"$exactOk"}"""
      )
    } finally spark.stop()
  }
}
