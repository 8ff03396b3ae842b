package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential testing of the custom Catalyst expressions: the
  * CODEGEN path (whole-stage on) and the INTERPRETED path (codegen forced
  * off) must both match an independently-written Scala reference on
  * adversarial inputs — NaN, ±Infinity, −0.0, empty arrays, mismatched
  * lengths, all-zero vectors. Codegen/eval divergence is the classic custom-
  * expression bug class (the two implementations live in different
  * languages inside one case class); the declared queries never feed these
  * edges, so the unit harness does. Seeded — deterministic.
  */
class ExpressionPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def interpretedOff[A](body: => A): A = {
    var out: Option[A] = None
    withConf(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN"
    ) { out = Some(body) }
    out.get
  }

  private val edgeFloats: Seq[Float] = Seq(
    Float.NaN,
    Float.PositiveInfinity,
    Float.NegativeInfinity,
    -0.0f,
    0.0f,
    Float.MinPositiveValue,
    Float.MaxValue,
    -Float.MaxValue,
    1.0f,
    -1.0f
  )

  private val rnd = new scala.util.Random(1234)

  private def randFloat(): Float =
    rnd.nextInt(8) match {
      case 0 => edgeFloats(rnd.nextInt(edgeFloats.size))
      case _ => ((rnd.nextGaussian() * 10).toFloat)
    }

  private def randVec(maxLen: Int = 9): Seq[Float] =
    Seq.fill(rnd.nextInt(maxLen + 1))(randFloat())

  // ---- references: written from the documented semantics, not the code 's
  // structure — left-to-right double accumulation over min length ----

  private def refDot(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def refDist2(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  private def refQuant(a: Seq[Float]): Seq[Byte] = {
    var mx = 0.0
    a.foreach { v => val x = math.abs(v.toDouble); if (x > mx) mx = x }
    val scale = mx / 127.0
    if (scale == 0.0) Seq.fill(a.length)(0: Byte)
    else
      a.map { f =>
        val d = f.toDouble / scale
        (if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)).toByte
      }
  }

  // doubles that are NaN on both sides count as equal; everything else
  // must match bit-for-bit (the oracle-parity bar the catalog holds)
  private def sameDouble(x: Double, y: Double): Boolean =
    (x.isNaN && y.isNaN) ||
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)

  test("graft_dot and graft_dist2: codegen == interpreted == reference on 400 adversarial pairs") {
    graft.functions.GraftFunctions.register(spark)
    val cases = Seq.tabulate(400)(i => (i, randVec(), randVec())) ++
      Seq((400, Seq.empty[Float], Seq.empty[Float]), (401, edgeFloats, edgeFloats))
    val df = cases
      .toDF("id", "a", "b")
      .withColumn("a", col("a").cast("array<float>"))
      .withColumn("b", col("b").cast("array<float>"))
      .select(
        col("id"),
        call_function("graft_dot", col("a"), col("b")).as("dot"),
        call_function("graft_dist2", col("a"), col("b")).as("d2")
      )
    def run(): Map[Int, (Double, Double)] =
      df.collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val gen = run()
    val interp = interpretedOff(run())
    cases.foreach { case (id, a, b) =>
      val (rd, r2) = (refDot(a, b), refDist2(a, b))
      assert(sameDouble(gen(id)._1, rd), s"codegen dot id=$id: ${gen(id)._1} != $rd a=$a b=$b")
      assert(sameDouble(interp(id)._1, rd), s"interp dot id=$id: ${interp(id)._1} != $rd")
      assert(sameDouble(gen(id)._2, r2), s"codegen dist2 id=$id: ${gen(id)._2} != $r2 a=$a b=$b")
      assert(sameDouble(interp(id)._2, r2), s"interp dist2 id=$id: ${interp(id)._2} != $r2")
    }
    // metamorphic: dist2 is symmetric and dist2(a,a)==0 for finite vectors
    val finite = Seq.fill(50)(Seq.fill(6)((rnd.nextGaussian() * 3).toFloat))
    finite.foreach { v =>
      assert(refDist2(v, v) == 0.0)
      assert(refDot(v, v) >= 0.0)
    }
  }

  test("multiple instances of each native expression compile in ONE codegen function") {
    // the cosine shape expands THREE graft_dot instances (q·v, q·q, v·v)
    // into one whole-stage function; fixed codegen locals collide there
    // and Janino's failure silently drops the stage to interpreted
    // (caught in the round-9b sf1 sweep log). fallback=false makes the
    // compile failure FATAL so this regression can never go quiet again.
    // the reproducing shape is m7's: a BroadcastNestedLoopJoin whose
    // cosine condition inlines all three graft_dot instances into ONE
    // unbraced generated scope (a plain projection braces each instance
    // behind its null check, hiding the collision — verified: the
    // minimal select form does NOT trip it, the declared query does)
    withConf("spark.sql.codegen.fallback" -> "false") {
      val rows = SparkEntry
        .queries("m7_semantic_dedup")(spark, "/root/testdata/sf0.001")
        .collect()
      assert(rows.nonEmpty)
    }
  }

  test("graft_band_hashes: codegen == interpreted == per-plane composed form") {
    // the fused signature expression must be BIT-identical to the
    // composed form it replaced (one graft_dot against each ±1 plane
    // literal, bits OR-packed per band) — same double accumulation in
    // index order, same >= 0 sign rule — on short, long, empty, and
    // adversarial (NaN/Inf: sign of NaN-dot is well-defined false for
    // `>= 0`) vectors, across several geometries including non-dividing
    // dims and 64-bit bands
    graft.functions.GraftFunctions.register(spark)
    val cases = Seq.tabulate(120)(i => (i, randVec(70))) ++
      Seq((120, Seq.empty[Float]), (121, edgeFloats),
        (122, Seq.fill(64)(0.0f)), (123, Seq.fill(64)(1.0f)))
    def refBands(v: Seq[Float], nBands: Int, bits: Int): Seq[Long] =
      (0 until nBands).map { b =>
        (0 until bits).foldLeft(0L) { (h, k) =>
          val j = b * bits + k
          var acc = 0.0
          var i = 0
          val n = math.min(v.length, 64)
          while (i < n) {
            acc += v(i).toDouble * graft.functions.Planes.sign(j, i).toDouble
            i += 1
          }
          if (acc >= 0.0) h | (1L << k) else h
        }
      }
    for ((nBands, bits) <- Seq((16, 8), (33, 13), (1, 64), (14, 8))) {
      val df = cases
        .toDF("id", "v")
        .withColumn("v", col("v").cast("array<float>"))
        .select(
          col("id"),
          call_function("graft_band_hashes", col("v"), lit(nBands), lit(bits)).as("h")
        )
      def run(): Map[Int, Seq[Long]] =
        df.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      val gen = run()
      val interp = interpretedOff(run())
      cases.foreach { case (id, v) =>
        val want = refBands(v, nBands, bits)
        assert(gen(id) == want, s"codegen ${nBands}x$bits id=$id: ${gen(id)} != $want")
        assert(interp(id) == want, s"interp ${nBands}x$bits id=$id")
      }
    }
  }

  test("gram_embed/band_hashes dims argument: default == explicit 64; wide forms match references") {
    // The SCALING.md decade-lever plumbing: graft_gram_embed(text, D) and
    // graft_band_hashes(v, B, b, D) take an optional literal dims. The
    // 1-arg/3-arg forms must stay BIT-identical to explicit 64 (the
    // m7b/oracle contract), and the wide forms must match independent
    // Scala references (scatter formula over md5-prefix trigram hashes;
    // per-plane sign sums over the shared Planes table at dims=512).
    graft.functions.GraftFunctions.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two", // no trigram -> zero vector
      "a b c a b c a b c a b c",
      ""
    ).zipWithIndex.map(_.swap)
    def refEmbed(t: String, dims: Int): Seq[Float] = {
      val h = graft.functions.ShingleHashing.md5PrefixSequence(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 3)
      val acc = new Array[Double](dims)
      h.foreach { x =>
        acc((x % dims).toInt) += (if ((x / dims) % 2 == 0L) 1.0 else -1.0)
      }
      acc.map(_.toFloat).toSeq
    }
    val df = texts.toDF("id", "t").select(
      col("id"),
      call_function("graft_gram_embed", col("t")).as("e1"),
      call_function("graft_gram_embed", col("t"), lit(64)).as("e64"),
      call_function("graft_gram_embed", col("t"), lit(512)).as("e512")
    )
    val rows = df.collect().map(r =>
      r.getInt(0) -> ((r.getSeq[Float](1), r.getSeq[Float](2), r.getSeq[Float](3)))).toMap
    texts.foreach { case (id, t) =>
      val (e1, e64, e512) = rows(id)
      assert(e1 == e64, s"default dims != explicit 64 for id=$id")
      assert(e1 == refEmbed(t, 64), s"64-dim embed mismatch for id=$id")
      assert(e512.length == 512, s"wide embed wrong length for id=$id")
      assert(e512 == refEmbed(t, 512), s"512-dim embed mismatch for id=$id")
    }
    // band hashes over a 512-dim vector against the per-plane reference
    def refBandsD(v: Seq[Float], nBands: Int, bits: Int, dims: Int): Seq[Long] =
      (0 until nBands).map { b =>
        (0 until bits).foldLeft(0L) { (h, k) =>
          val j = b * bits + k
          var acc = 0.0
          var i = 0
          val n = math.min(v.length, dims)
          while (i < n) {
            acc += v(i).toDouble * graft.functions.Planes.sign(j, i).toDouble
            i += 1
          }
          if (acc >= 0.0) h | (1L << k) else h
        }
      }
    val wide = texts.toDF("id", "t").select(
      col("id"),
      call_function("graft_band_hashes",
        call_function("graft_gram_embed", col("t"), lit(512)),
        lit(12), lit(9), lit(512)).as("h"),
      call_function("graft_band_hashes",
        call_function("graft_gram_embed", col("t")), lit(12), lit(9)).as("h64"),
      call_function("graft_band_hashes",
        call_function("graft_gram_embed", col("t")), lit(12), lit(9), lit(64)).as("h64e")
    )
    val wrows = wide.collect().map(r =>
      r.getInt(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3)))).toMap
    texts.foreach { case (id, t) =>
      val (h512, h64, h64e) = wrows(id)
      assert(h512 == refBandsD(refEmbed(t, 512), 12, 9, 512),
        s"512-dim band hashes mismatch for id=$id")
      assert(h64 == h64e, s"3-arg band hashes != explicit dims=64 for id=$id")
    }
  }

  test("graft_project: codegen == interpreted == per-plane reference sums") {
    // the fused projection must match per-plane left-to-right double
    // accumulation over the shared Planes table, each sum cast to float —
    // on short, empty, and adversarial (NaN/Inf) vectors, at several
    // output widths (bit-compare via floatToRawIntBits so -0.0f/NaN
    // representations can't false-pass)
    graft.functions.GraftFunctions.register(spark)
    val cases = Seq.tabulate(120)(i => (i, randVec(70))) ++
      Seq((120, Seq.empty[Float]), (121, edgeFloats),
        (122, Seq.fill(64)(0.0f)), (123, Seq.fill(64)(1.0f)))
    def refProj(v: Seq[Float], nDims: Int): Seq[Float] =
      (0 until nDims).map { j =>
        var acc = 0.0
        var i = 0
        val n = math.min(v.length, 64)
        while (i < n) {
          acc += v(i).toDouble * graft.functions.Planes.sign(j, i).toDouble
          i += 1
        }
        acc.toFloat
      }
    // Spark's UnsafeWriter canonicalizes float NaNs (any payload →
    // 0x7fc00000) when writing rows, so compare through floatToIntBits,
    // which applies the same canonicalization to the reference
    def bits(xs: Seq[Float]): Seq[Int] = xs.map(java.lang.Float.floatToIntBits)
    for (nDims <- Seq(16, 1, 64)) {
      val df = cases
        .toDF("id", "v")
        .withColumn("v", col("v").cast("array<float>"))
        .select(
          col("id"),
          call_function("graft_project", col("v"), lit(nDims)).as("p")
        )
      def run(): Map[Int, Seq[Float]] =
        df.collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
      val gen = run()
      val interp = interpretedOff(run())
      cases.foreach { case (id, v) =>
        val want = refProj(v, nDims)
        assert(bits(gen(id)) == bits(want), s"codegen d=$nDims id=$id: ${gen(id)} != $want")
        assert(bits(interp(id)) == bits(want), s"interp d=$nDims id=$id")
      }
    }
  }

  test("graft_byte_embed: codegen == interpreted == composed conv(hex(substring)) form") {
    graft.functions.GraftFunctions.register(spark)
    val rnd2 = new scala.util.Random(77)
    // ASCII-ish strings of varied length (the corpus contract), incl. 1-char
    val cases = Seq.tabulate(80)(i =>
      (i, Seq.fill(1 + rnd2.nextInt(200))((32 + rnd2.nextInt(95)).toChar).mkString)
    )
    val base = cases.toDF("id", "s").withColumn("payload", col("s").cast("binary"))
    def run(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[Float]] =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val fusedDf = base.select(
      col("id"),
      call_function("graft_byte_embed", col("payload")).as("e")
    )
    val composedDf = base
      .withColumn("n", length(col("payload")).cast("long"))
      .select(
        col("id"),
        array((0 until 64).map { i =>
          (conv(
            hex(expr(s"substring(payload, CAST(($i * n) DIV 64 AS INT) + 1, 1)")),
            16, 10
          ).cast("double") / lit(63.5) - lit(1.0)).cast("float")
        }: _*).as("e")
      )
    val fused = run(fusedDf)
    val composed = run(composedDf)
    val interp = interpretedOff(run(fusedDf))
    cases.foreach { case (id, s) =>
      assert(fused(id) == composed(id), s"fused != composed for id=$id '$s'")
      assert(interp(id) == composed(id), s"interp != composed for id=$id")
    }
  }

  test("graft_quantize_int8: codegen == interpreted == reference; range and zero laws hold") {
    graft.functions.GraftFunctions.register(spark)
    val cases = Seq.tabulate(300)(i => (i, randVec())) ++ Seq(
      (300, Seq.empty[Float]),
      (301, Seq(0.0f, -0.0f, 0.0f)),
      (302, edgeFloats),
      (303, Seq(Float.NaN, Float.NaN)),
      (304, Seq(Float.PositiveInfinity, 1.0f, -2.5f))
    )
    val df = cases
      .toDF("id", "a")
      .withColumn("a", col("a").cast("array<float>"))
      .select(col("id"), call_function("graft_quantize_int8", col("a")).as("q"))
    def run(): Map[Int, Seq[Byte]] =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Byte](1)).toMap
    val gen = run()
    val interp = interpretedOff(run())
    cases.foreach { case (id, a) =>
      val ref = refQuant(a)
      assert(gen(id) == ref, s"codegen quant id=$id: ${gen(id)} != $ref a=$a")
      assert(interp(id) == ref, s"interp quant id=$id: ${interp(id)} != $ref")
      // range law: NaN-free finite vectors stay within [-127, 127]
      if (a.forall(f => !f.isNaN && !f.isInfinite))
        assert(ref.forall(q => q >= -127 && q <= 127), s"range id=$id: $ref")
      // zero law: all-zero (or empty) vectors quantize to all zeros
      if (a.forall(_ == 0.0f)) assert(ref.forall(_ == 0))
    }
  }

  test("graft_pq_encode: codegen == interpreted == reference argmin with (dist2, cid) tie-break") {
    graft.functions.GraftFunctions.register(spark)
    val nSub = 2
    val subDim = 4
    val m = 5
    val cents: Seq[Seq[Seq[Float]]] = Seq.tabulate(nSub)(s =>
      Seq.tabulate(m)(j =>
        // duplicate centroid (j=3 copies j=1) forces the cid tie-break
        if (j == 3) Seq.tabulate(subDim)(i => ((s + 1) * (1 + 1) + i).toFloat)
        else Seq.tabulate(subDim)(i => ((s + 1) * (j + 1) + i).toFloat)
      )
    )
    val cids: Seq[Seq[Int]] = Seq.tabulate(nSub)(_ => Seq(9, 7, 5, 3, 1))
    def refEncode(v: Seq[Float]): Seq[Int] =
      (0 until nSub).map { s =>
        var bestD = Double.PositiveInfinity
        var bestCid = Int.MaxValue
        (0 until m).foreach { j =>
          var acc = 0.0
          (0 until subDim).foreach { i =>
            val d = v(s * subDim + i).toDouble - cents(s)(j)(i).toDouble
            acc += d * d
          }
          val cid = cids(s)(j)
          if (acc < bestD || (acc == bestD && cid < bestCid)) {
            bestD = acc; bestCid = cid
          }
        }
        bestCid
      }
    val cases = Seq.tabulate(300)(i =>
      (i, Seq.fill(nSub * subDim)((rnd.nextGaussian() * 6).toFloat))
    ) ++ Seq(
      (300, cents(0)(1) ++ cents(1)(1)), // exactly ON the duplicated centroid
      (301, Seq.fill(nSub * subDim)(Float.NaN)) // all-NaN: every dist NaN
    )
    val centsCol = typedlit(cents)
    val cidsCol = typedlit(cids)
    val df = cases
      .toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
      .select(
        col("id"),
        call_function("graft_pq_encode", col("v"), centsCol, cidsCol).as("code")
      )
    def run(): Map[Int, Seq[Int]] =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    val gen = run()
    val interp = interpretedOff(run())
    cases.foreach { case (id, v) =>
      val ref = refEncode(v)
      assert(gen(id) == ref, s"codegen pq id=$id: ${gen(id)} != $ref v=$v")
      assert(interp(id) == ref, s"interp pq id=$id: ${interp(id)} != $ref")
    }
    // the duplicated-centroid case must pick the SMALLER cid (3, not 5… the
    // copy of centroid j=1 sits at j=3 with cid 3 < cid 7)
    assert(gen(300) == Seq(3, 3), s"tie-break: ${gen(300)}")
    // all-NaN distances: nothing ever compares less — sentinel cid
    assert(gen(301) == Seq(Int.MaxValue, Int.MaxValue), s"NaN: ${gen(301)}")
  }

  test("graft_bloom_might_contain: zero false negatives over 10k inserted keys, both paths") {
    graft.functions.GraftFunctions.register(spark)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(10000, 0.03)
    val inserted = (0 until 10000).map(i => rnd.nextLong()).distinct
    inserted.foreach(bloom.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val df = inserted
      .toDF("key")
      .select(
        call_function("graft_bloom_might_contain", col("key"), lit(bos.toByteArray))
          .as("hit")
      )
    def misses(): Long = df.filter(!col("hit")).count()
    assert(misses() == 0L, "codegen path produced a false negative")
    assert(interpretedOff(misses()) == 0L, "interpreted path produced a false negative")
  }

  test("graft_bitmap_and_count: codegen == interpreted == reference intersections") {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.Bitmap64
    val r = new scala.util.Random(23)
    // adversarial shapes: overlapping clusters, disjoint far pages,
    // page-boundary ids, one empty bitmap, self-intersection
    def randSet(): Set[Long] =
      (Seq.fill(r.nextInt(200))(r.nextInt(9000).toLong) ++
        Seq.fill(r.nextInt(20))(r.nextLong(1L << 40)) ++
        Seq(4095L, 4096L).filter(_ => r.nextBoolean())).toSet
    val cases = Seq.tabulate(100)(i => (i, randSet(), randSet())) ++
      Seq((100, Set.empty[Long], randSet()), (101, Set.empty[Long], Set.empty[Long]))
    def bytes(s: Set[Long]) =
      Bitmap64.serialize(s.foldLeft(Map.empty: Bitmap64.Pages)(Bitmap64.add))
    val df = cases
      .map { case (id, a, b) => (id, bytes(a), bytes(b)) }
      .toDF("id", "a", "b")
      .select(
        col("id"),
        call_function("graft_bitmap_and_count", col("a"), col("b")).as("n"),
        call_function("graft_bitmap_and_count", col("a"), col("a")).as("card")
      )
    def run(): Map[Int, (Long, Long)] =
      df.collect().map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2))).toMap
    val gen = run()
    val interp = interpretedOff(run())
    cases.foreach { case (id, a, b) =>
      val expected = (a & b).size.toLong
      assert(gen(id)._1 == expected, s"codegen id=$id: ${gen(id)._1} != $expected")
      assert(interp(id)._1 == expected, s"interp id=$id")
      assert(gen(id)._2 == a.size.toLong, s"self-AND cardinality id=$id")
    }
  }
}
