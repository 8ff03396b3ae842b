package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Structural guarantees for the corpus-packaging operators (t9/t10) that
  * the value-level oracle can't express: plan shape and packing
  * invariants.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("t9 shards are contiguous, ordered, and within budget + one doc") {
    val rows = TextOps
      .queries("t9_token_shards")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // shard ids start at 0 and never decrease in doc order
    assert(rows.head._4 == 0L)
    assert(rows.sliding(2).forall { case Array(a, b) => b._4 >= a._4; case _ => true })
    // cum_tokens is the running sum of n_tokens
    var cum = 0L
    rows.foreach { case (_, n, c, _) => cum += n; assert(c == cum) }
    // every shard's token total is under budget plus its last document
    // (greedy packing property: a doc only spills when the budget is hit)
    val budget = 10000L
    rows.groupBy(_._4).foreach { case (_, docs) =>
      val total = docs.map(_._2).sum
      assert(total <= budget + docs.last._2)
    }
  }

  test("zero-token documents are NULL-defined in t1 and never win t28 representative") {
    // The driver corpus has no whitespace-only docs, so the 0/0 edge is
    // exercised here: both ratio columns and quality must be NULL (the
    // cross-engine definition — Spark's NaN vs DuckDB's NULL was a latent
    // hash mismatch), and under desc_nulls_last a null-quality doc must
    // lose representative selection to any real doc in its cluster.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zerotok").toString
    Seq(
      (0L, "   ", "en", "synthetic", 3L),
      (1L, "solid text with the a of real tokens", "en", "synthetic", 37L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t1 = TextOps
      .queries("t1_token_stats")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    assert(t1(0L).getLong(1) == 0L) // n_tokens
    assert(t1(0L).isNullAt(5) && t1(0L).isNullAt(6) && t1(0L).isNullAt(7))
    assert(!t1(1L).isNullAt(7))
    val t28 = TextOps
      .queries("t28_cluster_repr")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    // both docs are singleton clusters here, but the zero-token doc's
    // quality must be NULL and it must still be its own (only) member
    assert(t28(0L).isNullAt(3))
    assert(t28(0L).getBoolean(5) && t28(1L).getBoolean(5))
    // t32 shares the same quality window: under desc_nulls_last the
    // zero-token doc must rank BEHIND every real doc of its source
    val t32 = TextOps
      .queries("t32_source_caps")(spark, dir)
      .collect()
      .map(r => (r.getLong(2), r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(t32.length == 2)
    val byId = t32.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 1L && byId(1L)._3.nonEmpty) // real doc ranks first
    assert(byId(0L)._2 == 2L && byId(0L)._3.isEmpty)  // null quality ranks last
  }

  test("t13 chunk windows: stride-48/size-64 cover every token with 16-token overlap") {
    val chunks = TextOps
      .queries("t13_chunk_windows")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_._1)
    byDoc.foreach { case (doc, cs) =>
      val idxs = cs.map(_._2).sorted.toSeq
      assert(idxs == (0L until idxs.length).toSeq, s"doc $doc chunk gap")
      // chunk i covers tokens [48i, min(48i+64, n)): reconstruct n from
      // the last chunk, then every chunk size must equal min(64, n-48i)
      val sizes = cs.sortBy(_._2).map(_._3)
      val n = 48L * (sizes.length - 1) + sizes.last
      sizes.zipWithIndex.foreach { case (sz, i) =>
        assert(sz == math.min(64L, n - 48L * i), s"doc $doc chunk $i size $sz n=$n")
      }
      assert(sizes.last >= 1L)
    }
  }

  test("t11 redaction counts match the injected PII and output carries no raw PII") {
    val r = TextOps
      .queries("t11_pii_redact")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(r.nonEmpty)
    // exactly one email, one IP and at least one long digit run injected
    assert(r.forall(_.getLong(1) == 1L), "email count")
    assert(r.forall(_.getLong(2) == 1L), "ip count")
    assert(r.forall(_.getLong(3) >= 1L), "digit-run count")
  }

  test("t12 repetition ratio is in (0,1] and flags a degenerate repeated doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over the lazy sleeping dog")
    ).toDF("doc_id", "text")
    // drive the same expression graph over a fixture with a known answer
    val out = TextOps
      .queries("t12_repetition")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.forall { r =>
      val ratio = r.getDouble(3)
      ratio > 0.0 && ratio <= 1.0
    })
    val spam = docs
      .select(col("doc_id"), explode(graft.functions.F.wordShingles(graft.functions.F.wsTokens(col("text")), 2)).as("gram"))
      .groupBy("doc_id", "gram").count()
      .groupBy("doc_id").agg((max("count") / sum("count")).as("ratio"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(spam(1L) == 1.0) // "spam spam" x9 -> fully repetitive
    assert(spam(2L) < 0.2) // natural sentence stays under the keep bar
  }

  test("t32 caps every source at K and keeps each source's best quality") {
    val kept = TextOps
      .queries("t32_source_caps")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(kept.nonEmpty)
    val bySource = kept.groupBy(_._1)
    // every source present, none over the cap, ranks dense from 1
    assert(bySource.size == 20)
    bySource.foreach { case (src, rows) =>
      assert(rows.length <= 10, s"$src over cap")
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("t33 is exactly the t4 pairs whose members straddle a t14 split") {
    val splits = TextOps
      .queries("t14_hash_split")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .toMap
    val pairs = TextOps
      .queries("t4_dedup_ngram_jaccard")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.filter { case (a, b) => splits(a) != splits(b) }.toSet
    val leaked = TextOps
      .queries("t33_split_leakage")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4)))
    assert(leaked.map(t => (t._1, t._2)).toSet == expected)
    // and the labels it reports agree with t14's, per member
    leaked.foreach { case (a, b, sa, sb) =>
      assert(sa == splits(a) && sb == splits(b) && sa != sb)
    }
  }

  test("t14 split is a pure function of doc_id and lands near 80/10/10") {
    val bySf = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").map { dir =>
      TextOps
        .queries("t14_hash_split")(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> r.getString(2))
        .toMap
    }
    // stability: every doc present at both scale factors keeps its split
    // (the property that makes a hash split safe under corpus growth)
    val shared = bySf(0).keySet & bySf(1).keySet
    assert(shared.nonEmpty)
    assert(shared.forall(id => bySf(0)(id) == bySf(1)(id)))
    // proportions: 80/10/10 within a tolerance suiting 5k docs
    val counts = bySf(1).values.groupBy(identity).view.mapValues(_.size).toMap
    val n = bySf(1).size.toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.05, counts)
    assert(math.abs(counts("valid") / n - 0.1) < 0.04, counts)
    assert(math.abs(counts("test") / n - 0.1) < 0.04, counts)
  }

  test("t16 clusters are the transitive closure of t4 pairs with min-id labels") {
    val labels = TextOps
      .queries("t16_dedup_clusters")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byDoc = labels.map(l => l._1 -> l._2).toMap
    val pairs = TextOps
      .queries("t4_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // every near-dup pair collapsed into one cluster
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) split across clusters")
    }
    // label is the min member id; exactly one canonical per cluster
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid == members.map(_._1).min, s"cluster $cid label not min id")
      assert(members.count(_._4) == 1, s"cluster $cid canonical count")
      assert(members.forall(_._3 == members.length), s"cluster $cid size col")
    }
    // the planted near-dups make at least one multi-member cluster, and
    // docs outside any pair stay singletons
    assert(labels.exists(_._3 > 1))
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    labels.filterNot(l => paired(l._1)).foreach { l =>
      assert(l._3 == 1L && l._4, s"singleton ${l._1} mislabeled")
    }
  }

  test("t20 bigram scores are log-probabilities and cover every bigram") {
    val rows = TextOps
      .queries("t20_bigram_lm")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // mean log-prob of MLE probabilities is <= 0, and a corpus-fit model
    // gives every document a finite score (no unseen bigrams possible)
    rows.foreach { case (id, n, lp) =>
      assert(n >= 1L, s"doc $id has no bigrams")
      assert(lp <= 0.0 && !lp.isNaN && !lp.isInfinite, s"doc $id avg_logp $lp")
    }
    // n_bigrams is exactly n_tokens - 1 (every adjacent pair scored)
    val toks = TextOps
      .queries("t1_token_stats")(spark, sf)
      .select("doc_id", "n_tokens")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    rows.foreach { case (id, n, _) =>
      assert(n == toks(id) - 1, s"doc $id bigram count $n vs tokens ${toks(id)}")
    }
  }

  test("t19 bloom prefilter returns exactly t10's result, probe in the plan") {
    val t19 = TextOps.queries("t19_bloom_decontaminate")(spark, sf)
    // the codegen bloom probe sits in the plan (not a UDF)
    assert(
      t19.queryExecution.executedPlan.toString.contains("graft_bloom_might_contain"),
      "bloom probe missing from plan"
    )
    // no false negatives: bloom prefilter + exact verify == exact check
    val got = t19.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = TextOps
      .queries("t10_decontaminate")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("t10 streams the corpus through a broadcast join (no training-side shuffle)") {
    val plan = TextOps
      .queries("t10_decontaminate")(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    // contaminated pairs found in the planted near-dup corpus
    val n = TextOps.queries("t10_decontaminate")(spark, sf).count()
    assert(n > 0)
  }

  test("t37 cumulative type counts equal brute-force prefix distincts") {
    // the min-first-bucket identity vs the definition it replaces:
    // distinct types over every doc_id prefix, computed naively
    val sf = "/root/testdata/sf0.001"
    val got = TextOps
      .queries("t37_vocab_growth")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.sources.Tables
      .documents(spark, sf)
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val maxId = docs.map(_._1).max
    def bucket(id: Long) = id * 10 / (maxId + 1)
    def tokens(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    got.foreach { case (b, cumTok, cumTyp) =>
      val prefix = docs.filter(d => bucket(d._1) <= b)
      val toks = prefix.flatMap(d => tokens(d._2))
      assert(cumTok == toks.length.toLong, s"bucket $b token count")
      assert(cumTyp == toks.distinct.length.toLong, s"bucket $b type count")
    }
    assert(got.nonEmpty && got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
  }

  test("t38 grades a verbatim eval copy contaminated and disjoint text clean") {
    // doc_id 10 is eval (id % 10 == 0); 11 copies it verbatim → every
    // shingle hits → overlap 1.0; 12 shares no vocabulary → overlap 0.0.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-t38").toString
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (10L, evalText, "en", "eval", 8L),
      (11L, evalText, "en", "train", 8L),
      (12L, "one two three four five six seven eight", "en", "train", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps
      .queries("t38_contamination_score")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getString(4)))
      .toMap
    assert(got.keySet == Set(11L, 12L)) // eval docs are not scored
    assert(got(11L) == ((1.0, "contaminated")))
    assert(got(12L) == ((0.0, "clean")))
  }

  test("t39 coverage is a monotone curve ending at 1.0 when the vocab fits") {
    val rows = TextOps
      .queries("t39_vocab_coverage")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // frontier sizes ascend and cumulative counts/coverage never decrease
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.sliding(2).forall {
      case Array(a, b) => b._2 >= a._2 && b._3 >= a._3
      case _ => true
    })
    assert(rows.forall(r => r._3 > 0.0 && r._3 <= 1.0))
    // differential: recompute every frontier point exactly in the driver
    // from raw token counts with the same (count desc, token) tie-break
    val counts = graft.sources.Tables
      .documents(spark, sf)
      .select("text")
      .collect()
      .flatMap(_.getString(0).trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity)
      .map { case (t, o) => (t, o.length.toLong) }
      .toSeq
      .sortBy { case (t, n) => (-n, t) }
    val total = counts.map(_._2).sum
    rows.foreach { case (k, cum, cov) =>
      val expect = counts.take(k.toInt).map(_._2).sum
      assert(cum == expect, s"cum_tokens at K=$k")
      assert(cov == expect.toDouble / total.toDouble, s"coverage at K=$k")
    }
    // rows exist exactly for the candidate sizes the vocab can fill
    val want = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L).filter(_ <= counts.size)
    assert(rows.map(_._1).toSeq == want)
  }

  test("t41 separates index dups, in-batch dups, and uniques on planted arrivals") {
    // ids % 4 != 0 are the served index; % 4 == 0 arrive as a batch.
    //  4 copies index doc 1 verbatim        -> dup_index of 1, jaccard 1.0
    //  8+12 copy EACH OTHER (new content)   -> 8 unique (first arrival),
    //                                          12 dup_batch of 8
    //  16 shares nothing                    -> unique
    // Exact copies guarantee signature-band collisions, so the spec can
    // never flake on the probabilistic banding recall.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-t41").toString
    val idxText = "the quick brown fox jumps over the lazy dog again and again today"
    val newText = "completely different content words here for the batch duplicate pair test case"
    Seq(
      (1L, idxText, "en", "idx", 1L),
      (2L, "unrelated filler index document with several plain words inside", "en", "idx", 1L),
      (4L, idxText, "en", "new", 1L),
      (8L, newText, "en", "new", 1L),
      (12L, newText, "en", "new", 1L),
      (16L, "zebra quartz vivid jackdaws my sphinx of black wow love glum", "en", "new", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps
      .queries("t41_minhash_index_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(got.keySet == Set(4L, 8L, 12L, 16L))
    assert(got(4L) == (("dup_index", 1L)))
    assert(got(8L) == (("unique", -1L)))
    assert(got(12L) == (("dup_batch", 8L)))
    assert(got(16L) == (("unique", -1L)))
  }

  test("t41's bucket cap suppresses a degenerate flood without losing small clusters") {
    // 100 identical arrivals saturate every band bucket past the cap
    // (df=100 > 64) -> their pair candidates are dropped and the flood
    // reports unique with BOUNDED work (no 100² candidate join) — the
    // exact-dup flood is upstream t3's job. A small 2-doc cluster in the
    // same batch (df=2) must still match.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-t41cap").toString
    val flood = "same words repeated in every flooded arrival document here"
    val pair = "a distinct small near duplicate cluster of exactly two docs"
    val rows =
      (1 to 100).map(i => (i * 4L, flood, "en", "new", 1L)) ++ Seq(
        (404L, pair, "en", "new", 1L),
        (408L, pair, "en", "new", 1L),
        (1L, "unrelated index content sitting in the served corpus", "en", "idx", 1L)
      )
    rows
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps
      .queries("t41_minhash_index_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    (1 to 100).foreach(i => assert(got(i * 4L) == "unique", s"flood doc ${i * 4} not suppressed"))
    assert(got(404L) == "unique")
    assert(got(408L) == "dup_batch", "small cluster lost to the cap")
  }

  test("t40 buckets partition each language with strictly ordered score ranges") {
    val rows = TextOps
      .queries("t40_perplexity_buckets")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (lang, bs) =>
      val m = bs.map(b => b._2 -> b).toMap
      // score ranges are disjoint and ordered head > middle > tail:
      // whole bins share a bucket, so min(head) must clear max(middle)
      for ((hi, lo) <- Seq(("head", "middle"), ("middle", "tail")))
        if (m.contains(hi) && m.contains(lo))
          assert(m(hi)._4 > m(lo)._5, s"$lang: $hi overlaps $lo")
      // buckets partition the scored docs of the language
      val scored = TextOps
        .queries("t20_bigram_lm")(spark, sf)
        .join(
          graft.sources.Tables.documents(spark, sf).select("doc_id", "lang"),
          "doc_id"
        )
        .filter(col("lang") === lang)
        .count()
      assert(bs.map(_._3).sum == scored, s"$lang: bucket counts don't partition")
    }
  }

  test("t59 provenance from PERSISTED stage outputs matches inline t59; audit plan has no Generate") {
    // Production grain: the dedup stages (t3/t28/t54) persist their
    // verdict frames once per ingest, and the provenance audit reads the
    // STORED tables instead of recomputing three dedup pipelines from raw
    // text. Same verdicts row-for-row, and the audit plan is three
    // doc_id-keyed joins — no shingle Generate anywhere.
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft-t59-stages").toString
    TextOps.queries("t3_dedup_exact")(spark, sf).write.parquet(s"$dir/stage_exact")
    TextOps.queries("t28_cluster_repr")(spark, sf).write.parquet(s"$dir/stage_near")
    TextOps.queries("t54_containment_dedup")(spark, sf).write.parquet(s"$dir/stage_contain")
    TextOps.exactSubstrClaims(spark, sf).write.parquet(s"$dir/stage_exsub")
    val stored = TextOps.provenanceVerdicts(
      spark.read.parquet(s"$dir/stage_exact"),
      spark.read.parquet(s"$dir/stage_near"),
      spark.read.parquet(s"$dir/stage_contain"),
      spark.read.parquet(s"$dir/stage_exsub")
    )
    val plan = stored.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"stored-stage audit must not re-shingle:\n$plan")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)),
        r.getLong(3), Option(r.get(4))))
      .toSeq
    val inline = rows(TextOps.queries("t59_dedup_provenance")(spark, sf))
    val got = rows(stored)
    assert(got.nonEmpty && got == inline, "stored-stage provenance diverged from inline t59")
    // the suffix stage's claims actually surface: some doc must be
    // exactsubstr-trimmed (or at least carry a removed-token count) on
    // a fixture that t65/t66 prove has repeated 16-token spans
    assert(inline.exists(_._4 > 0L), "no exactsubstr claims surfaced in t59")
  }

  test("t70 packing is a contiguous partition of the concatenated corpus") {
    val rows = TextOps
      .queries("t70_sequence_packing")(spark, sf)
      .collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total > 512L, "fixture should span multiple chunks")
    val chunked = rows.filter(!_.isNullAt(2))
    // the last token's chunk is exactly ceil-arithmetic on the corpus total
    assert(chunked.map(_.getLong(3)).max == (total - 1) / 512)
    // every chunk id in [0, max] is someone's home — no gaps, no padding
    val covered = chunked
      .flatMap(r => r.getLong(2) to r.getLong(3))
      .toSet
    assert(covered == (0L to (total - 1) / 512).toSet, "chunk coverage has gaps")
    chunked.foreach { r =>
      assert(r.getLong(4) == r.getLong(3) - r.getLong(2) + 1, s"n_chunks wrong: $r")
      assert((r.getInt(5) == 1) == (r.getLong(3) > r.getLong(2)), s"crosses wrong: $r")
    }
    // zero-token docs contribute to no example
    rows.filter(_.getLong(1) == 0).foreach(r => assert(r.isNullAt(2) && r.isNullAt(5)))
  }

  test("t62 trainer: iteration 1 equals t34's pick and t48's corpus symbol ledger; merges compound") {
    val ledger = TextOps
      .queries("t62_bpe_train")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(ledger.length == 3, s"expected 3 trainer iterations, got ${ledger.length}")
    // iteration 1's pick IS t34's top merge candidate (weight and pair)
    val t34Top = TextOps
      .queries("t34_bpe_merge_stats")(spark, sf)
      .limit(1)
      .collect()(0)
    assert(ledger(0)._2 + ledger(0)._3 == t34Top.getString(0),
      s"iter-1 pair ${ledger(0)._2}+${ledger(0)._3} != t34 top ${t34Top.getString(0)}")
    assert(ledger(0)._4 == t34Top.getLong(1), "iter-1 weight != t34 top weight")
    // iteration 1's corpus symbol count == t48's per-doc ledger, summed
    val t48Total = TextOps
      .queries("t48_bpe_apply_merge")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_symbols_after"))
      .collect()(0)
      .getLong(0)
    assert(ledger(0)._5 == t48Total,
      s"iter-1 symbols ${ledger(0)._5} != t48 corpus total $t48Total")
    // training must strictly compress: each merge removes weight>0 pairs
    assert(ledger.sliding(2).forall { case Array(a, b) => b._5 < a._5 },
      s"symbol count must strictly decrease across iterations: ${ledger.map(_._5).toSeq}")
    assert(ledger.forall(_._4 > 0), "every merge must have positive weight")
    // t63's encode reproduces the trainer's final state doc-by-doc:
    // corpus symbol total under the applied merges == iter-3 ledger
    val encode = TextOps
      .queries("t63_bpe_encode")(spark, sf)
      .agg(
        org.apache.spark.sql.functions.sum("n_symbols"),
        org.apache.spark.sql.functions.sum("n_chars")
      )
      .collect()(0)
    assert(encode.getLong(0) == ledger(2)._5,
      s"t63 corpus symbols ${encode.getLong(0)} != t62 iter-3 ${ledger(2)._5}")
    assert(encode.getLong(0) < encode.getLong(1),
      "encoded symbols must be fewer than raw chars once any merge applied")
  }

  test("t44b ledger tie: shard totals == clean-set tokens minus the fixed point's removals") {
    import org.apache.spark.sql.functions.{sum => fsum, col => fcol}
    // t44's shard totals ARE the clean-set token count (packing moves
    // tokens, never drops them), so the tie is: t44 total − Σ per-pass
    // tokens_removed (the converge ledger over the SAME subcorpus) ==
    // t44b total. This is the accounting that says the composed
    // pipeline removed exactly what the fixed point claims — no tokens
    // lost or invented between stages.
    val cleanTotal = TextOps.queries("t44_clean_to_shards")(spark, sf)
      .agg(fsum("shard_tokens")).collect()(0).getLong(0)
    val packedTotal = TextOps.queries("t44b_clean_shards_converged")(spark, sf)
      .agg(fsum("shard_tokens")).collect()(0).getLong(0)
    val words0 = graft.sources.Tables.documents(spark, sf)
      .select(fcol("doc_id"), graft.functions.F.wsTokens(fcol("text")).as("w"))
      .join(TextOps.t44CleanSet(spark, sf).select("doc_id"), "doc_id")
    val base = TextOps.documentsSnapshot(sf)
    val tagOf = (k: Int) => base + "|t44b" + (if (k == 0) "" else s"|p$k")
    val (ledger, _) = TextOps.exactSubstrConvergeOn(
      spark, words0, tagOf, 16, TextOps.exsubMaxPasses)
    assert(ledger.nonEmpty, "converge emitted no ledger")
    val removed = ledger.map(_._4).sum
    assert(cleanTotal - removed == packedTotal,
      s"token ledger broke: clean=$cleanTotal removed=$removed packed=$packedTotal")
    assert(ledger.last._5 == 0L || ledger.length == TextOps.exsubMaxPasses,
      s"ledger neither converged nor exhausted the budget: $ledger")
  }

  test("converge memo keys the FULL tag sequence: divergent-tail tag functions never alias") {
    import org.apache.spark.sql.functions.{col => fcol}
    // r13 finding #2 / r14 verdict #5: the first close keyed only tags
    // 0-1, so two callers sharing those but diverging from pass 2 on
    // would alias to one cached fixed point. The key now enumerates
    // every tag the run could touch; a same-prefix/different-tail tag
    // function must MISS (fresh frame), an identical one must HIT
    // (same frame reference — that is what the memo is for).
    val words0 = graft.sources.Tables.documents(spark, sf)
      .select(fcol("doc_id"), graft.functions.F.wsTokens(fcol("text")).as("w"))
    val base = TextOps.documentsSnapshot(sf) + "|aliasspec"
    val tagA = (k: Int) => if (k <= 1) s"$base|p$k" else s"$base|A$k"
    val tagB = (k: Int) => if (k <= 1) s"$base|p$k" else s"$base|B$k"
    val (ledA, dfA) = TextOps.exactSubstrConvergeOn(spark, words0, tagA, 16, 3)
    val (ledA2, dfA2) = TextOps.exactSubstrConvergeOn(spark, words0, tagA, 16, 3)
    assert(dfA2 eq dfA, "identical tag sequence should hit the memo")
    assert(ledA2 == ledA)
    val (_, dfB) = TextOps.exactSubstrConvergeOn(spark, words0, tagB, 16, 3)
    assert(!(dfB eq dfA),
      "tag functions sharing only tags 0-1 aliased to one cached fixed point")
  }

  test("t62b tie-breaks in code-point order, matching Spark/DuckDB on surrogate pairs") {
    import spark.implicits._
    // the adversarial collation case: a supplementary-plane symbol
    // (emoji U+1F600, UTF-16 lead unit 0xD83D) ties against a BMP
    // symbol in U+E000..U+FFFF (U+FFFD). Java's String order ranks the
    // emoji FIRST (0xD83D < 0xFFFD); UTF-8 binary / code-point order —
    // what Spark's orderBy and DuckDB use — ranks U+FFFD first
    // (0x FFFD < 0x1F600). The driver loop must agree with the engine.
    val emoji = new String(Character.toChars(0x1F600))
    val text = s"${emoji}X �X"
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-cp").toString
    Seq((0L, text, "en", "synthetic", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val engine = TextOps.bpeTrainLedger(spark, dir, iters = 2)
    val driver = TextOps.bpeTrainLedgerDriver(spark, dir, iters = 2)
    assert(driver == engine,
      s"surrogate-pair tie-break diverged:\nengine=$engine\ndriver=$driver")
    // and the first pick is the code-point-smaller left symbol
    assert(engine.head._2 == "�",
      s"expected U+FFFD to win the tie in code-point order, got ${engine.head._2}")
  }

  test("t62b driver trainer is bit-equal to t62's in-engine loop, at N=3 and deeper") {
    // the certified-sibling gate: same picks, same tie-breaks, same
    // corpus symbol accounting — this equality is what licenses t62b to
    // share t62's oracle and t63/t64 to consume its merges unchanged
    val engine3 = TextOps.bpeTrainLedger(spark, sf, iters = 3)
    val driver3 = TextOps.bpeTrainLedgerDriver(spark, sf, iters = 3)
    assert(driver3 == engine3,
      s"N=3 ledgers diverged:\nengine=$engine3\ndriver=$driver3")
    // deeper than the declared query: 8 in-engine iterations (8 Spark
    // jobs — cheap at sf0.001) vs the driver loop, still bit-equal
    val engine8 = TextOps.bpeTrainLedger(spark, sf, iters = 8)
    val driver8 = TextOps.bpeTrainLedgerDriver(spark, sf, iters = 8)
    assert(driver8 == engine8,
      s"N=8 ledgers diverged:\nengine=$engine8\ndriver=$driver8")
    // and the loop runs at production N without exhaust errors: ledger
    // ends at vocabulary exhaustion, every step still compresses
    val vocab = graft.sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.F.wsTokens(org.apache.spark.sql.functions.col("text"))).as("w"))
      .groupBy("w").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val big = TextOps.bpeDriverMergeLoop(vocab, iters = 10000)
    assert(big.nonEmpty && big.length < 10000,
      s"fixture vocab should exhaust below N=10000, got ${big.length}")
    assert(big.sliding(2).forall {
      case Seq(a, b) => b._5 < a._5
      case _         => true
    }, "driver loop must strictly compress until exhaustion")
    assert(big.take(8) == engine8, "prefix of the deep run drifted from the engine loop")
  }
}
