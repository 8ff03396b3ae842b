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
