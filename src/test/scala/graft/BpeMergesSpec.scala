package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeMerges
import graft.operators.TextOps

/** The merges.txt boundary's contract: a trained ledger survives the
  * write → read round trip bit for bit, the native encoder produces the
  * SAME corpus tokenization from the file-loaded list as from in-engine
  * trainer state, and malformed files fail loudly with their line
  * number (the JsonlCorpus discipline at the tokenizer edge).
  */
class BpeMergesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmpFile(): String =
    java.nio.file.Files.createTempFile("graft-merges", ".txt").toString

  test("t62 ledger → merges.txt → encode equals the in-engine t64 path") {
    graft.functions.GraftFunctions.register(spark)
    val ledger = TextOps
      .queries("t62_bpe_train")(spark, sf)
      .orderBy("iter")
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
    val f = tmpFile()
    BpeMerges.write(ledger, f)
    val loaded = BpeMerges.read(f)
    assert(loaded == ledger, "round trip changed the merge list")
    // header present, rank order preserved on disk
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(f))
    assert(lines.get(0).startsWith("#version"))
    assert(lines.size() == 1 + ledger.size)

    val toks = graft.functions.F.wsTokens(col("text"))
    val fromFile = graft.sources.Tables
      .documents(spark, sf)
      .select(col("doc_id"), explode(toks).as("w"))
      .withColumn(
        "syms",
        call_function("graft_bpe_encode", col("w"), lit(BpeMerges.packed(loaded)))
      )
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(size(col("syms"))).cast("long").as("n_symbols")
      )
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val inEngine = TextOps
      .queries("t64_bpe_encode_native")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(fromFile == inEngine, "file-loaded merges encode diverged from t64")
  }

  test("merges with '#'-leading symbols survive the round trip") {
    // code corpora legitimately train merges like ("#", "include") —
    // the old read() skipped EVERY '#'-prefixed line as a header and
    // silently shrank the list (round-12 advice #1); only line 1 is
    // header now
    val merges = Seq(("#", "include"), ("a", "b"), ("#include", "<stdio"))
    val f = tmpFile()
    BpeMerges.write(merges, f)
    assert(BpeMerges.read(f) == merges, "a '#'-leading merge was dropped")
    // and a '#' merge landing on the FIRST data line (line 2, after the
    // always-written header) still round-trips
    val f2 = tmpFile()
    BpeMerges.write(Seq(("#", "define")), f2)
    assert(BpeMerges.read(f2) == Seq(("#", "define")))
  }

  test("malformed and degenerate files fail loudly") {
    def writeRaw(lines: Seq[String]): String = {
      val f = tmpFile()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      f
    }
    // three fields on line 2
    val bad = writeRaw(Seq("#version: 0.2", "a b c"))
    val e1 = intercept[IllegalArgumentException](BpeMerges.read(bad))
    assert(e1.getMessage.contains("line 2"), e1.getMessage)
    // one field
    val bad2 = writeRaw(Seq("ab"))
    val e2 = intercept[IllegalArgumentException](BpeMerges.read(bad2))
    assert(e2.getMessage.contains("line 1"), e2.getMessage)
    // header-only: no merges is an error, not an empty tokenizer
    val empty = writeRaw(Seq("#version: 0.2"))
    val e3 = intercept[IllegalArgumentException](BpeMerges.read(empty))
    assert(e3.getMessage.contains("no merge pairs"), e3.getMessage)
    // unrepresentable symbol refuses at write time
    val e4 = intercept[IllegalArgumentException](
      BpeMerges.write(Seq(("a b", "c")), tmpFile()))
    assert(e4.getMessage.contains("whitespace"), e4.getMessage)
    val e5 = intercept[IllegalArgumentException](
      BpeMerges.write(Seq.empty, tmpFile()))
    assert(e5.getMessage.contains("empty merge list"), e5.getMessage)
  }
}
