package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** IVF (inverted-file) approximate nearest neighbor — the indexed scale
  * path for similarity search (v1 brute force is the correctness baseline;
  * v3 hyperplane LSH the hash path).
  *
  * Build: k coarse centroids via distributed Lloyd iterations (seeds =
  * deterministic id-sampled vectors — no RNG, reproducible anywhere), then
  * one pass assigning every vector to its nearest centroid (the "inverted
  * list"). Query: score only the `nProbe` nearest lists per query.
  *
  * At 100 TB: centroids come from an id-sampled subset (here: all rows —
  * same code path), assignment is one broadcast-join pass, and queries
  * touch nProbe/k of the data. Everything is DataFrame ops + the native
  * dot expression: no driver-side math except collecting k centroid
  * vectors (k is small by construction).
  */
object IvfAnn {

  val k = 16
  val nProbe = 4
  val lloydIters = 2

  /** Nearest-centroid id for an embedding against a broadcast centroid
    * table; ties break on centroid id (deterministic). */
  private def assignTo(centroids: DataFrame)(df: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("vec_id")
      .orderBy(col("dist2").asc, col("cid").asc)
    df.crossJoin(broadcast(centroids))
      // squared L2 via dot products: |v-c|^2 = v.v - 2 v.c + c.c
      .withColumn(
        "dist2",
        call_function("graft_dot", col("embedding"), col("embedding"))
          - lit(2.0) * call_function("graft_dot", col("embedding"), col("centroid"))
          + call_function("graft_dot", col("centroid"), col("centroid"))
      )
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "dist2")
  }

  /** Deterministic k-means-lite: seed with the k lowest vec_ids, run a few
    * Lloyd iterations (assign + per-cluster mean), all as DataFrame ops. */
  def centroids(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    // Seed ids are the seeds' own vec_ids, not a row_number: the mapping
    // vec_id -> rank over the k lowest ids is order-preserving, so every
    // downstream "ties break on cid asc" is unchanged — and there is no
    // unpartitioned numbering window (which would single-partition the plan
    // and WARN on every run if the limit were ever lifted).
    var cents = emb
      .orderBy("vec_id")
      .limit(k)
      .select(
        col("vec_id").cast("int").as("cid"),
        col("embedding").cast("array<float>").as("centroid")
      )
    (0 until lloydIters).foreach { _ =>
      val assigned = assignTo(cents)(emb)
      cents = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("cid", "dim")
        .agg(avg("x").as("mean"))
        .groupBy("cid")
        .agg(
          transform(
            array_sort(collect_list(struct(col("dim"), col("mean")))),
            e => e.getField("mean").cast("float")
          ).as("centroid")
        )
    }
    cents
  }

  /** Declared query: IVF top-5 neighbors for queries vec_id < 10, probing
    * the nProbe nearest lists. The build is hash-free and deterministic, so
    * unlike the LSH family this IS oracle-checked (unrolled-Lloyd DuckDB
    * SQL, `VectorOps.oracles("v6_ann_ivf")`); recall vs v1 is additionally
    * gated in ScalaTest. */
  def query(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val emb = Tables.embeddings(s, d)
    val cents = centroids(emb)
    val indexed = assignTo(cents)(emb) // (vec_id, embedding, cid)

    val queries = emb.filter(col("vec_id") < 10)
    // nProbe nearest centroids per query
    val wq = Window.partitionBy("qid").orderBy(col("dist2").asc, col("cid").asc)
    val probes = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn(
        "dist2",
        call_function("graft_dot", col("qe"), col("qe"))
          - lit(2.0) * call_function("graft_dot", col("qe"), col("centroid"))
          + call_function("graft_dot", col("centroid"), col("centroid"))
      )
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qe"), col("cid"))

    // score only vectors in probed lists
    val wr = Window
      .partitionBy("qid")
      .orderBy(col("cos").desc, col("vec_id").asc)
    probes
      .join(indexed, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
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
