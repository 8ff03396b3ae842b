package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BpeKernel, BpeRanks}
import org.apache.spark.unsafe.types.UTF8String

/** The native `graft_bpe_encode` expression (t64's engine) against its
  * declared contract: the replace-chain foldLeft (t63's plan shape and
  * DuckDB `replace`'s semantics). The kernel is differential-tested at
  * N≈64 on ADVERSARIAL merge lists — duplicated pairs, non-trained
  * orderings, pairs that never occur — where the two algorithms'
  * equivalence argument (forward-only rank pointer skips exactly the
  * ranks the chain would no-op) actually gets exercised; the declared
  * t64 query only ever sees the trained N=3 ledger.
  */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SOH = "\u0001"
  private val STX = "\u0002"
  private val NUL = "\u0000"

  /** Independent Scala reference: t63's literal replace chain on the
    * wrapped symbol string. java.lang.String#replace is the same greedy
    * left-to-right non-overlapping scan as Spark's and DuckDB's. */
  private def chainEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val wrapped = word
      .codePoints()
      .toArray
      .map(cp => SOH + new String(Character.toChars(cp)) + STX)
      .mkString
    val out = merges.foldLeft(wrapped) { case (s, (l, r)) =>
      s.replace(SOH + l + STX + SOH + r + STX, SOH + l + r + STX)
    }
    if (out.isEmpty) Seq.empty
    else
      out
        .substring(1, out.length - 1)
        .split(java.util.regex.Pattern.quote(STX + SOH), -1)
        .toSeq
  }

  private def kernelEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val ranks = new BpeRanks(merges.map { case (l, r) => l + NUL + r }.toArray)
    val arr = BpeKernel.encode(UTF8String.fromString(word), ranks)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("kernel == replace chain on random words under random trained-shaped merges (N=64)") {
    val rnd = new scala.util.Random(4242)
    val alphabet = "abcd"
    // trained-shaped: each merge joins two already-available symbols;
    // duplicates allowed on purpose (multi-rank pairs)
    val available = scala.collection.mutable.ArrayBuffer[String]("a", "b", "c", "d")
    val merges = (1 to 64).map { _ =>
      val l = available(rnd.nextInt(available.length))
      val r = available(rnd.nextInt(available.length))
      available += (l + r)
      (l, r)
    }
    val words = (1 to 400).map { _ =>
      val len = rnd.nextInt(13)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ "aaaaaaaa" :+ "abcdabcdabcd"
    words.foreach { w =>
      val expected = chainEncode(w, merges)
      val got = kernelEncode(w, merges)
      assert(got == expected, s"word '$w': kernel $got != chain $expected")
      assert(got.mkString == w, s"word '$w': symbols must concatenate back")
    }
  }

  test("kernel == replace chain under ADVERSARIAL (non-trained) merge lists") {
    val rnd = new scala.util.Random(777)
    val syms = Seq("a", "b", "c", "ab", "bc", "abc", "ba", "aa", "cab")
    (1 to 60).foreach { trial =>
      val n = 1 + rnd.nextInt(64)
      val merges = (1 to n).map { _ =>
        (syms(rnd.nextInt(syms.length)), syms(rnd.nextInt(syms.length)))
      }
      val words = (1 to 40).map { _ =>
        (1 to rnd.nextInt(11)).map(_ => "abc" (rnd.nextInt(3))).mkString
      }
      words.foreach { w =>
        val expected = chainEncode(w, merges)
        val got = kernelEncode(w, merges)
        assert(got == expected, s"trial $trial word '$w' merges $merges: $got != $expected")
      }
    }
  }

  test("recreated pair pins CHAIN semantics, not lowest-rank-first") {
    // rank 0 wants (x, ab) but 'ab' only exists after rank 1 runs; the
    // chain never revisits rank 0, a lowest-rank-first tokenizer would
    val merges = Seq(("x", "ab"), ("a", "b"))
    assert(chainEncode("xab", merges) == Seq("x", "ab"))
    assert(kernelEncode("xab", merges) == Seq("x", "ab"))
  }

  test("unicode words: code-point symbols, surrogate pairs intact") {
    val merges = Seq(("é", "t"), ("😀", "ét"))
    val w = "😀été"
    // wrap: [😀, é, t, é] → merge (é,t): [😀, ét, é] → merge (😀, ét): [😀ét, é]
    val expected = Seq("😀ét", "é")
    assert(chainEncode(w, merges) == expected)
    assert(kernelEncode(w, merges) == expected)
  }

  test("expression: codegen and interpreted agree with the kernel through a DataFrame") {
    graft.functions.GraftFunctions.register(spark)
    val merges = Seq(("a", "b"), ("ab", "c"), ("d", "a"), ("da", "abc"))
    val enc = merges.map { case (l, r) => l + NUL + r }.toArray
    val words = Seq("daabcx", "", "abc", "aaab", "xyz", "dadaabc")
    val df = words.toDF("w").select(
      col("w"),
      call_function("graft_bpe_encode", col("w"), lit(enc)).as("syms")
    )
    def run(): Map[String, Seq[String]] =
      df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val cg = run()
    val prevWs = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", prevWs)
        spark.conf.set("spark.sql.codegen.factoryMode", prevFm)
      }
    words.foreach { w =>
      val expected = chainEncode(w, merges)
      assert(cg(w) == expected, s"codegen '$w'")
      assert(interp(w) == expected, s"interpreted '$w'")
    }
  }

  test("builder rejects wrong arity, non-foldable merges, malformed entries") {
    graft.functions.GraftFunctions.register(spark)
    val one = intercept[Exception] {
      spark.sql("SELECT graft_bpe_encode('ab')").collect()
    }
    assert(one.getMessage.contains("2 arguments"), one.getMessage)
    val nonFoldable = intercept[Exception] {
      Seq(("ab", Seq("xy"))).toDF("w", "m")
        .select(call_function("graft_bpe_encode", col("w"), col("m")))
        .collect()
    }
    assert(nonFoldable.getMessage.contains("foldable"), nonFoldable.getMessage)
    val malformed = intercept[Exception] {
      new BpeRanks(Array("ab")) // no NUL separator
    }
    assert(malformed.getMessage.contains("l NUL r"), malformed.getMessage)
  }

  test("t64 equals t63 frame-for-frame on the sf0.001 fixture") {
    val sf = "/root/testdata/sf0.001"
    val legacy = SparkEntry.queries("t63_bpe_encode")(spark, sf).collect().toSeq
    val native = SparkEntry.queries("t64_bpe_encode_native")(spark, sf).collect().toSeq
    assert(native == legacy, s"t64 diverged from t63: ${native.diff(legacy).take(3)}")
  }

  test("trainer ledger cache is keyed on fixture CONTENT: a regenerated dir yields fresh picks") {
    val tmp = java.nio.file.Files.createTempDirectory("bpe-cache").toString
    Seq((1L, "aa bb aa"), (2L, "aa aa cc"))
      .toDF("doc_id", "text")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val first = SparkEntry.queries("t62_bpe_train")(spark, tmp).collect()
    assert(first.nonEmpty && first(0).getString(1) == "a",
      s"corpus 1 trains (a,a) first, got ${first.toSeq}")
    // regenerate the SAME dir with different content — a stale cache
    // would keep serving corpus 1's merges
    Seq((1L, "zz yy zz"), (2L, "zz zz yy"))
      .toDF("doc_id", "text")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val second = SparkEntry.queries("t62_bpe_train")(spark, tmp).collect()
    assert(second.nonEmpty && second(0).getString(1) == "z",
      s"regenerated corpus must train (z,z) first, got ${second.toSeq}")
  }
}
