package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Product quantization ANN (v11) — the third leg of the vector-compression
  * family (v8 int8 scalar quantization = 4×, v6 IVF = probe pruning; PQ
  * stores each 64-dim float vector as eight 4-bit sub-centroid ids — FOUR
  * BYTES, a 64× compression, the representation a 100 TB ANN index
  * actually keeps in memory).
  *
  * Build: the vector splits into 8 subspaces of 8 dims; per subspace, 16
  * sub-centroids from one deterministic Lloyd pass (seeds = the 16 lowest
  * vec_ids' subvectors — same id-seeded recipe as IVF, so the whole build
  * is reproducible in SQL). A vector's code is its 8 nearest-sub-centroid
  * ids. Query: asymmetric distance (ADC) — the query stays full-precision,
  * the candidate is reconstructed per subspace from its code — then exact
  * re-rank of the top-50 survivors, as in v9/v10.
  *
  * All assignment/encoding/ADC math runs in TWO native codegen expressions
  * ([[graft.functions.PqEncode]] / [[graft.functions.PqAdcDistance]]) over
  * the collected codebook literals (driver-side size fixed by
  * construction: 8 subspaces × 16 × 8 floats): no crossJoin shuffle, no
  * per-row allocation. The first implementation unrolled the same math
  * into ~128 Catalyst nodes (slice/element_at/array_min-over-structs) and
  * evaluated at ~120 µs/row — 2.5 s of the old 3.9 s bench time was that
  * projection alone. Coarse ordering uses round(adc, 6) so cross-engine
  * ulp noise from the 8-term sum cannot flip a rank (ties fall to vec_id
  * on both engines).
  */
object PqAnn {

  val nSub = 8
  val subDim = 8
  val kSub = 16

  private def subCol(v: Column, s: Int): Column = slice(v, s * subDim + 1, subDim)

  /** The codebook as the two parallel literal columns the native
    * expressions take: [subspace][entry][dim] floats, [subspace][entry]
    * ascending cids (a subspace whose Lloyd pass emptied a cluster only
    * materializes present entries — mirroring the oracle). */
  private def centsLit(cents: Array[Seq[(Int, Seq[Float])]]): Column =
    typedlit(cents.map(_.map(_._2)).toSeq)
  private def cidsLit(cents: Array[Seq[(Int, Seq[Float])]]): Column =
    typedlit(cents.map(_.map(_._1)).toSeq)

  private def encode(cents: Array[Seq[(Int, Seq[Float])]], v: Column): Column =
    call_function("graft_pq_encode", v, centsLit(cents), cidsLit(cents))

  /** One deterministic Lloyd pass per subspace; returns, per subspace,
    * the present (cid, centroid) pairs sorted by cid — means float-rounded
    * like the IVF build. */
  def subCentroids(emb: DataFrame): Array[Seq[(Int, Seq[Float])]] = {
    val seedVecs = emb
      .orderBy("vec_id")
      .limit(kSub)
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0))
    val seeds: Array[Seq[(Int, Seq[Float])]] =
      Array.tabulate(nSub)(s =>
        seedVecs.toSeq.zipWithIndex.map { case (v, cid) =>
          cid -> v.slice(s * subDim, (s + 1) * subDim)
        }
      )
    // assign every (vector, subspace) to its nearest seed, mean per
    // (s, cid, dim): one explode + one shuffle for all 8 subspaces; the
    // per-subspace argmin is one native encode call, not 8 unrolled trees
    val assigned = emb
      .withColumn("enc", encode(seeds, col("embedding")))
      .select(
        explode(
          array((0 until nSub).map { s =>
            struct(
              lit(s).as("s"),
              subCol(col("embedding"), s).as("sub"),
              element_at(col("enc"), s + 1).as("cid")
            )
          }: _*)
        ).as("a")
      )
    val means = assigned
      .select(col("a.s").as("s"), col("a.cid").as("cid"), posexplode(col("a.sub")).as(Seq("dim", "x")))
      .groupBy("s", "cid", "dim")
      .agg(avg("x").cast("float").as("m"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getFloat(3)))
    Array.tabulate(nSub) { s =>
      means
        .filter(_._1 == s)
        .groupBy(_._2)
        .toSeq
        .sortBy(_._1)
        .map { case (cid, rows) =>
          val vec = rows.sortBy(_._3).map(_._4).toSeq
          cid -> vec
        }
    }
  }

  /** Declared query: PQ-ADC top-5 for queries vec_id < 10 with exact
    * re-rank of the 50 coarse survivors. Fully oracle-checked (the build
    * is deterministic; the DuckDB oracle unrolls it subspace-wise).
    * Recall vs brute force is gated at ≥ 0.6 (not the 0.8 of v3/v6):
    * 4-bit-per-subspace codes on THIS corpus's unstructured vectors trade
    * recall for the 64× footprint — measured 0.72 at sf0.01 — and the
    * gate pins the measured floor honestly rather than overclaiming. */
  def query(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val emb = Tables.embeddings(s, d)
    val cents = subCentroids(emb)

    // the index at rest: (vec_id, eight 4-bit ids) — the 64x-compressed form
    val codes = emb.select(
      col("vec_id"),
      col("embedding"),
      encode(cents, col("embedding")).as("code")
    )
    val queries = emb
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))

    // ADC: per subspace, distance from the query's subvector to the
    // candidate's RECONSTRUCTED subvector (its sub-centroid), summed in
    // fixed subspace order; round(.,6) for cross-engine rank stability
    val adc =
      call_function("graft_pq_adc", col("qe"), col("code"), centsLit(cents), cidsLit(cents))

    val wc = Window.partitionBy("qid").orderBy(col("adc").asc, col("vec_id").asc)
    val wr = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    codes
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("adc", round(adc, 6))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= 50)
      .withColumn(
        "cos",
        call_function("graft_dot", col("qe"), col("embedding")) /
          (sqrt(call_function("graft_dot", col("qe"), col("qe"))) *
            sqrt(call_function("graft_dot", col("embedding"), col("embedding"))))
      )
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("qid").as("query_id"), col("rnk"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rnk")
  }
}
