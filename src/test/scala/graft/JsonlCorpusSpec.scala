package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.export.JsonlCorpus
import graft.operators.TextOps
import graft.sources.Tables

/** Round-trip + pruning contract for the JSONL interchange boundary. */
class JsonlCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("JSONL round-trip preserves every document byte-for-byte, split stays a directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    // the real pipeline shape: t14's stable hash split labels the corpus
    val labeled = Tables
      .documents(spark, sf)
      .join(
        TextOps.queries("t14_hash_split")(spark, sf).select("doc_id", "split"),
        "doc_id"
      )
    JsonlCorpus.write(labeled, dir)
    // gzip shards under split directories
    val trainFiles = new java.io.File(s"$dir/split=train").listFiles()
    assert(trainFiles != null && trainFiles.exists(_.getName.endsWith(".json.gz")))

    val back = JsonlCorpus.read(spark, dir)
    val a = labeled
      .select("doc_id", "text", "lang", "source", "n_chars", "split")
      .collect()
      .map(_.toSeq)
      .toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(b == a, s"round-trip diverged: ${(a -- b).take(2)} vs ${(b -- a).take(2)}")

    // split read prunes to its directory — no train/test file is touched
    val validScan = JsonlCorpus.readSplit(spark, dir, "valid")
    val files = JsonlCorpus.scannedFiles(validScan)
    assert(files.nonEmpty && files.forall(_.contains("split=valid")),
      s"valid read touched foreign splits: ${files.filterNot(_.contains("split=valid")).take(3)}")
    assert(validScan.count() == labeled.filter(col("split") === "valid").count())
  }

  test("the ExactSubstr-cleaned corpus exits through the JSONL edge and survives readback") {
    // the end-to-end cleaning pipeline a curation team actually ships:
    // t68 rewrites the corpus, the survivors leave as JSONL (tokenizer
    // workers consume THIS, not parquet), and the readback is the
    // cleaned corpus exactly — zero-survivor docs are dropped by the
    // export filter, not smuggled through as empty strings
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-clean").toString
    val meta = Tables.documents(spark, sf).select("doc_id", "lang", "source")
    val split = TextOps.queries("t14_hash_split")(spark, sf).select("doc_id", "split")
    val cleaned = TextOps
      .queries("t68_exactsubstr_rewrite")(spark, sf)
      .filter(col("clean_text").isNotNull)
      .select(col("doc_id"), col("clean_text").as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .join(meta, "doc_id")
      .join(split, "doc_id")
      .select("doc_id", "text", "lang", "source", "n_chars", "split")
    JsonlCorpus.write(cleaned, dir)
    val back = JsonlCorpus.read(spark, dir)
    val a = cleaned.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a.nonEmpty && b == a, "cleaned-corpus JSONL round-trip diverged")
    // the export is the REWRITTEN text: total chars strictly under the
    // original corpus's (the fixture provably has repeated spans)
    val origChars = Tables.documents(spark, sf)
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    val cleanChars = back.agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(cleanChars < origChars, "rewrite exported but nothing was removed")
  }

  test("a corrupt line fails the read loudly instead of becoming a null row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/split=train"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/split=train/part-0.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |{"doc_id": BROKEN not json
        |""".stripMargin
    )
    val ex = intercept[Exception] {
      JsonlCorpus.read(spark, dir).collect()
    }
    assert(ex.getMessage != null)
  }
}
