package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost decomposition of m7c_semantic_dedup_ivf (r15): the
  * query's serial driver actions are timed one by one — featurize+count,
  * centroid fit (store vs fresh), probe+cache+count, the epb measurement,
  * and the candidate+verify tail — so the remaining wall clock is
  * attributable. Usage: runMain graft.tools.M7cProbe [reps]
  */
object M7cProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder
      .master("local[32]")
      .appName("m7c-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.functions.GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"M7C $name%-24s ${(System.nanoTime - t0) / 1e9}%7.3f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"--- rep $rep")
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val emb = graft.multimodal.MultimodalOps.gramEmbeddings(docs).cache()
      val n = t("featurize+count")(emb.count())
      val nLists = math.min(256L, math.max(32L, n / 2000L)).toInt
      val cents = t("fit(store)")(
        graft.operators.IvfAnn.storedCentroids(
          spark,
          graft.operators.TextOps.documentsSnapshot(d),
          "gram-emb",
          nLists
        )(
          graft.operators.IvfAnn
            .centroids(emb.select(col("vec_id"), col("embedding")), nLists)
        )
      )
      t("fit(fresh)")(
        graft.operators.IvfAnn.collectCents(
          graft.operators.IvfAnn
            .centroids(emb.select(col("vec_id"), col("embedding")), nLists)
        )
      )
      val probed = graft.operators.IvfAnn
        .withProbedCids(cents, "embedding", probes = 4)(
          emb.select("vec_id", "embedding", "nrm")
        )
        .cache()
      val nProbed = t("probe+cache+count")(probed.count())
      val listPop = math.max(1L, nProbed / nLists)
      val epb = t("epb-measure")(graft.operators.VectorOps.inListNeighborEpb(probed))
      val (nBands, bandBits) = t("solve")(
        graft.operators.VectorOps.bandGeometryMeasured(
          listPop, epb, tau = 0.85, targetCandPerVec = 256 * 4, maxMiss = 1e-6, fanOut = 4
        )
      )
      println(s"M7C geometry ${nBands}x$bandBits nLists=$nLists")
      val cand = graft.operators.VectorOps.bandedCandidateStreamKeyed(
        probed.select("cid", "vec_id", "embedding"),
        extraKeys = Seq("cid"),
        nBands = nBands,
        bandBits = bandBits
      )
      t("candidates-only")(cand.count())
      t("candidates+verify")(
        graft.multimodal.MultimodalOps.verifiedPairs(cand, emb).count()
      )
      // VARIANT: signature computed ONCE per vec_id (n rows), cid
      // assignments broadcast-joined on — same (cid, band, bh) collision
      // keyspace, 1/probes of the graft_band_hashes work
      val banded0 = emb
        .select(
          col("vec_id"),
          posexplode(
            call_function("graft_band_hashes", col("embedding"), lit(nBands), lit(bandBits))
          ).as(Seq("band", "bh"))
        )
      val bandedJ = banded0
        .join(broadcast(probed.select("cid", "vec_id")), "vec_id")
        .repartition(col("cid"), col("band"), col("bh"))
      val candV = bandedJ
        .as("x")
        .join(bandedJ.as("y"), Seq("cid", "band", "bh"))
        .filter(col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      t("candidates-only(v2)")(candV.count())
      t("cand+verify(v2)")(
        graft.multimodal.MultimodalOps.verifiedPairs(candV, emb).count()
      )
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
