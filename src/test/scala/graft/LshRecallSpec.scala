package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextOps, VectorOps}

/** Fidelity of the LSH-family scale paths against their exact counterparts
  * on the driver's sf0.001 testdata (these are the queries the driver can
  * only rows-check — this is their correctness gate).
  */
class LshRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("MinHash+LSH dedup finds the same pairs as exact n-gram Jaccard") {
    val exact = TextOps
      .queries("t4_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = VectorOps
      .queries("v4_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // LSH verifies candidates with the exact Jaccard, so lsh ⊆ exact always;
    // at jaccard>0.8 with 32 perms / 8 bands recall should be total here.
    assert(lsh.subsetOf(exact))
    assert(lsh == exact, s"missed pairs: ${exact -- lsh}")
  }

  test("LSH ANN recall vs brute force >= 50% at k=5") {
    val exact = VectorOps
      .queries("v1_ann_bruteforce")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSet
    val lsh = VectorOps
      .queries("v3_ann_lsh")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("IVF ANN recall vs brute force >= 60% at k=5") {
    val exact = VectorOps
      .queries("v1_ann_bruteforce")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSet
    val ivf = VectorOps
      .queries("v6_ann_ivf")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("winnowing fingerprints recover the exact near-dup pairs") {
    val exact = TextOps
      .queries("t4_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val winnow = TextOps
      .queries("t6_winnow_fingerprint")(spark, sf)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact.subsetOf(winnow), s"missed: ${exact -- winnow}")
  }

  test("SimHash near-dup pairs are also exact near-dups") {
    val exact = TextOps
      .queries("t4_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val sim = VectorOps
      .queries("v5_simhash")(spark, sf)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // hamming<=3 of 64 bits is a (much) stricter similarity bar; everything
    // it finds must be a true near-dup pair.
    assert(sim.subsetOf(exact), s"false positives: ${sim -- exact}")
    assert(sim.nonEmpty)
  }
}
