package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Pins for the storage-layout techniques the 100 TB design leans on but
  * no declared query can show on driver-generated flat parquet: bucketed
  * co-located joins (shuffle elimination), partition pruning, and
  * filter/column pushdown all the way into the scan. Each assertion is on
  * the PHYSICAL plan — the technique either reaches the scan/join or the
  * test fails.
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed co-located join runs with ZERO shuffle exchanges") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write
      .bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write
      .bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark
        .table("orders_b")
        .join(spark.table("lineitem_b"), $"o_orderkey" === $"l_orderkey")
      val p = j.queryExecution.executedPlan.toString
      // co-located buckets: the sort-merge join consumes both scans with
      // no repartitioning anywhere in the plan
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"), s"bucketing did not eliminate the shuffle:\n$p")
      // and it computes the same join as the unbucketed form
      val n = j.count()
      val n0 = orders.join(lineitem, $"o_orderkey" === $"l_orderkey").count()
      assert(n == n0 && n > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("runtime bloom-filter join injection prunes the fact side before the shuffle") {
    // Catalyst's runtime row-level filtering: a selective filter on the
    // dim side gets compiled into a bloom filter that is PUSHED onto the
    // fact side's scan branch, so fact rows that cannot join are dropped
    // before they shuffle — at 100 TB this is the difference between
    // shuffling the whole fact table and shuffling the ~matching slice.
    // The application-side size threshold (10GB default) is met naturally
    // at production scale; the test lowers it to prove the mechanism on
    // driver-scale parquet, the same convention as the AQE skew pin.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val l = Tables.lineitem(spark, sf)
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("bloom"),
        s"runtime bloom filter was not injected:\n$p")
      // the filter is a pure pruning optimization — row-identical result
      val n = j.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val n0 = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == n0 && n > 0)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("partition pruning, filter pushdown and column pruning reach the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables
      .orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write
      .mode("overwrite")
      .partitionBy("o_year")
      .parquet(dir)
    val q = spark.read
      .parquet(dir)
      .filter(col("o_year") === 1995 && col("o_orderkey") < 1000)
      .select("o_orderkey")
    val p = q.queryExecution.executedPlan.toString
    // the partition predicate prunes directories, never scanning them
    assert("PartitionFilters: \\[[^\\]]*o_year#\\d+ = 1995".r.findFirstIn(p).isDefined, p)
    // the row-level predicate reaches the parquet reader
    assert(p.contains("PushedFilters") && p.contains("LessThan(o_orderkey,1000)"), p)
    // only the projected column is decoded
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint>"), p)
    // and the pruned read agrees with the unpruned filter
    val expected = Tables
      .orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1995 && col("o_orderkey") < 1000)
      .count()
    assert(q.count() == expected && expected > 0)
  }

  test("v12b band geometry: widening bands kills the quadratic background, keeps τ=0.9 recall") {
    // The SCALING.md knob, pinned: with fixed geometry an uncorrelated pair
    // collides with constant probability ≈ nBands·2^-bandBits, so candidates
    // grow quadratically in corpus size (measured 7.7× on a 10× corpus).
    // Going 16×8 → 32×12 must (a) cut the candidate count hard and (b) lose
    // no true τ=0.9 pair — banded+verify stays exactly the exact criterion.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val base = (0 until 400).map(i => (i.toLong, unit()))
    // 50 near-dup copies: tiny perturbation keeps cosine > 0.9
    val dups = (0 until 50).map { i =>
      val (_, v) = base(i)
      val p = v.map(x => x + rnd.nextGaussian().toFloat * 0.02f)
      (1000L + i, p)
    }
    val emb = (base ++ dups)
      .map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .cache()
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(graft.operators.VectorOps.cosinePairsExact(emb, 0.9))
    assert(exact.size >= 45, s"fixture lost its near-dup structure: ${exact.size}")
    val candNarrow = graft.operators.VectorOps.bandedCandidates(emb, 16, 8).cache()
    val candWide = graft.operators.VectorOps.bandedCandidates(emb, 32, 12).cache()
    val (nNarrow, nWide) = (candNarrow.count(), candWide.count())
    info(s"candidates: 16x8=$nNarrow 32x12=$nWide exact-pairs=${exact.size}")
    // background: 450 vectors ≈ 101k pairs; 16×8 passes ~6%, 32×12 ~0.8%
    assert(nWide * 3 < nNarrow, s"widening did not prune: $nNarrow -> $nWide")
    val verifiedWide =
      pairSet(graft.operators.VectorOps.verifyCosinePairs(candWide, emb, 0.9))
    assert(verifiedWide == exact,
      s"missed: ${exact -- verifiedWide}; extra: ${verifiedWide -- exact}")
    // ... and the AUTO geometry (bandGeometry's pick for this corpus size)
    // must also keep every true pair — the solver's miss bound, exercised
    val (autoBands, autoBits) =
      graft.operators.VectorOps.bandGeometry(emb.count(), 0.9)
    val verifiedAuto = pairSet(
      graft.operators.VectorOps.verifyCosinePairs(
        graft.operators.VectorOps.bandedCandidates(emb, autoBands, autoBits),
        emb,
        0.9
      )
    )
    assert(verifiedAuto == exact,
      s"auto geometry ${autoBands}x$autoBits missed: ${exact -- verifiedAuto}")
  }

  test("bandGeometry: background bound, miss bound, and monotone widening hold analytically") {
    import graft.operators.VectorOps.bandGeometry
    val tau = 0.9
    val p = 1.0 - math.acos(tau) / math.Pi
    var prevBits = 0
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L, 100000000000L)) {
      val (bands, bits) = bandGeometry(n, tau)
      // background candidates per vector bounded (or the 24-bit clamp hit)
      val background = n.toDouble * bands / math.pow(2, bits)
      assert(background <= 32.0 || bits == 24,
        s"n=$n geometry ${bands}x$bits background=$background")
      // true-pair miss stays within the advertised 1% (+ rounding slack)
      val miss = math.pow(1.0 - math.pow(p, bits), bands)
      assert(miss <= 0.011, s"n=$n geometry ${bands}x$bits miss=$miss")
      // more corpus never narrows the buckets
      assert(bits >= prevBits, s"bits shrank at n=$n")
      prevBits = bits
    }
    // the oracle-certified default is what the solver would pick for a tiny
    // corpus modulo the minimum width — floor is 8 bits
    assert(bandGeometry(100L, tau)._2 == 8)
  }

  test("v17 nLists scale knob: 4× more lists holds recall on a clustered corpus") {
    // The other SCALING.md knob: with fixed nLists, v17's per-node candidate
    // count is the list size n/nLists — linear in n, quadratic in total
    // (measured 5.6× on a 10× corpus; nLists=64 at sf1 cut 12.5s → 4.7s).
    // Widening is only admissible if recall survives, and on CLUSTERED data
    // it must: a node's true neighbors share its cluster, and k-means lists
    // track clusters whatever their count. Uniform noise would NOT pass
    // this — same caveat as the v11/v17 gates — which is exactly the point:
    // the knob is for real corpora, which cluster.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(50)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val emb = (0 until 4000).map { i =>
      val c = centers(i % 50)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.15f).toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .cache()
    val a = emb
      .select(col("vec_id").as("src_id"), col("embedding").as("se"))
      .withColumn("sn", sqrt(call_function("graft_dot", col("se"), col("se"))))
    val b = emb
      .select(col("vec_id").as("nbr_id"), col("embedding").as("ne"))
      .withColumn("nn", sqrt(call_function("graft_dot", col("ne"), col("ne"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src_id")
      .orderBy(col("cos").desc, col("nbr_id").asc)
    val exact = a
      .crossJoin(b)
      .filter(col("src_id") =!= col("nbr_id"))
      .withColumn(
        "cos",
        call_function("graft_dot", col("se"), col("ne")) / (col("sn") * col("nn"))
      )
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("src_id", "nbr_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    def recall(nLists: Int): Double = {
      val got = graft.operators.VectorOps
        .knnGraph(emb, nLists)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .toSet
      (exact & got).size.toDouble / exact.size
    }
    val (r16, r64) = (recall(16), recall(64))
    info(s"v17 recall on clustered corpus: nLists=16 → $r16, nLists=64 → $r64")
    assert(r64 >= 0.9, s"widened-geometry recall collapsed: $r64")
    assert(r64 >= r16 - 0.05, s"widening lost recall: $r16 -> $r64")
    // the auto-sizing rule: constant target list size, floored at the
    // oracle's 16, capped where the centroid table stops being a scalar
    import graft.operators.VectorOps.ivfListsFor
    assert(ivfListsFor(2000) == 16) // small corpus keeps the default
    assert(ivfListsFor(20000) == 78)
    assert(ivfListsFor(100000000L) == 4096) // driver-side centroid cap
    // below the centroid cap (4096·256 ≈ 1M) the average list tracks 256
    for (n <- Seq(10000L, 100000L, 1000000L))
      assert(math.abs(n.toDouble / ivfListsFor(n) - 256) <= 256,
        s"list size drifted from target at n=$n")
  }
}
