package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** t75 (embedding-grain decontamination) against the structural gap it
  * exists to close: a PLANTED paraphrase-shaped leak — a training doc
  * that carries an eval item's dominant content but dilutes its distinct
  * 3-gram surface below every n-gram threshold — is invisible to t38's
  * shingle-overlap verdict and caught by t75's embedding-cosine screen
  * (round-13 verdict ask #2's "done" criterion, verbatim).
  */
class EmbedDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t75fix").toString
    rows
      .map { case (id, text) => (id, text, "en", "planted", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted paraphrase leak: t38 reads clean, t75 reads contaminated") {
    val phrase = "alpha beta gamma delta epsilon"
    // eval item (doc_id % 10 == 0): the phrase, repeated for signal
    val evalDoc = 10L -> Seq.fill(8)(phrase).mkString(" ")
    // the leak (train side): the SAME dominant content, wrapped in a
    // long distinct-trigram tail that dilutes 3-gram overlap to ~2% —
    // the shape a surface rewrite of a benchmark item produces
    val leakDoc = 11L ->
      (Seq.fill(30)(phrase) ++ (1 to 200).map(i => s"junk$i")).mkString(" ")
    val background = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L) ++ (11L to 29L).filter(_ % 10 != 0).drop(1))
      .map(id => id -> (1 to 12).map(i => s"bg${id}w$i").mkString(" "))
    val dir = writeDocs(Seq(evalDoc, leakDoc) ++ background)

    // the n-gram family's verdict on the leak: CLEAN — distinct-shingle
    // overlap is hits/|train shingles|, and the tail buries it
    val t38 = TextOps
      .queries("t38_contamination_score")(spark, dir)
      .filter(col("doc_id") === 11L)
      .head()
    assert(t38.getAs[String]("verdict") == "clean",
      s"fixture broken: t38 overlap ${t38.getAs[Double]("overlap")} not below 0.2")

    // t75's embedding screen: the count-weighted trigram direction
    // survives the dilution — doc 11 is flagged against eval item 10
    val t75 = TextOps.queries("t75_embed_decontaminate")(spark, dir).collect()
    val hit = t75.find(_.getAs[Long]("doc_id") == 11L)
    assert(hit.isDefined, s"t75 missed the planted leak; rows=${t75.toSeq}")
    assert(hit.get.getAs[Long]("top_eval_id") == 10L)
    assert(hit.get.getAs[Double]("max_cos") > 0.8)
    // and the background stays unflagged — the screen is a filter, not
    // a fire alarm
    assert(t75.forall(r => r.getAs[Long]("doc_id") == 11L),
      s"background docs flagged: ${t75.toSeq}")
  }

  test("t75's banded plan equals the exact eval-x-train screen on the driver fixture") {
    // the m7b equality discipline in-engine: the declared query's banded
    // candidate stage vs a brute-force exact arm over the same
    // featurizer — band-geometry recall is certified by equality, not
    // assumed (the DuckDB oracle pins the same identity at sf0.01)
    import org.apache.spark.sql.functions.{broadcast, call_function, length, round => sround}
    val sf = "/root/testdata/sf0.001"
    val spark0 = spark
    val banded = TextOps
      .queries("t75_embed_decontaminate")(spark0, sf)
      .collect()
      .map(_.toSeq)
      .toSeq
    val emb = graft.multimodal.MultimodalOps.gramEmbedFrame(
      spark0.read.parquet(s"$sf/documents.parquet").filter(length(col("text")) > 0),
      col("doc_id"),
      col("text")
    )
    val ev = emb
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("ee"), col("nrm").as("en"))
    val exact = emb
      .filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id").as("doc_id"), col("embedding").as("te"), col("nrm").as("tn"))
      .crossJoin(broadcast(ev))
      .withColumn(
        "cos",
        call_function("graft_dot", col("te"), col("ee")) / (col("tn") * col("en"))
      )
      .filter(col("cos") > 0.8)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{count => scount, lit, row_number}
    val wBest = Window.partitionBy("doc_id").orderBy(col("cos").desc, col("eval_id").asc)
    val exactOut = exact
      .withColumn("n_eval_hits", scount(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        col("n_eval_hits"),
        col("eval_id").as("top_eval_id"),
        sround(col("cos"), 6).as("max_cos")
      )
      .orderBy("doc_id")
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(banded == exactOut, "banded t75 diverged from the exact screen")
    assert(banded.nonEmpty, "fixture produced no contamination rows — equality is vacuous")
  }

  test("t75 eval-vs-train restriction: no train-train or eval-eval pair can surface") {
    // two IDENTICAL train docs (cos 1.0 to each other) and no eval twin:
    // a corpus-internal dedup would pair them; the decontaminator must
    // not — its only pair source is eval x train
    val dir = writeDocs(Seq(
      1L -> "one two three four five six seven eight",
      2L -> "one two three four five six seven eight",
      10L -> "totally different benchmark words here entirely"
    ))
    val out = TextOps.queries("t75_embed_decontaminate")(spark, dir).collect()
    assert(out.isEmpty, s"non-eval pair surfaced: ${out.toSeq}")
  }
}
