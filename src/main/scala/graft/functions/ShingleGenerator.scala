package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Expression, Generator, UnaryExpression, XXH64
}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{
  ArrayType, DataType, FloatType, IntegerType, LongType, StringType,
  StructField, StructType
}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator: the distinct, sorted, rank-annotated word
  * n-gram shingle hashes of a document, emitted in ONE pipelined generate
  * step — `(shingle: long, sz: int, rn: int)` per distinct shingle, where
  * `sz` is the document's distinct-shingle count and `rn` the 1-based rank
  * of this shingle in ascending (signed) hash order.
  *
  * Why a Generator and not the compositional form: the equivalent built-in
  * pipeline (posexplode tokens -> lead() windows to assemble n-grams ->
  * top-level xxhash64 -> per-doc dedupe + count + row_number windows)
  * needs a shuffle on doc_id plus two window sorts before the shingle join
  * can start. The sz/rn annotations are per-document facts that this
  * generator computes while the doc's shingle set is already in hand, so
  * the whole dedup build side (tokenize, shingle, hash, dedupe, size,
  * prefix-rank) becomes shuffle-FREE and pipelines straight into the
  * PPJoin candidate join. At 100 TB that removes the full shingle-stream
  * shuffle (the largest intermediate in the dedup pipeline) entirely.
  *
  * Hash parity: exactly `xxhash64(concat_ws(' ', w_i..w_{i+n-1}))` — XXH64
  * with seed 42 over the UTF-8 bytes — so results are bit-identical to the
  * compositional form (asserted in ShingleGeneratorSpec). Tokenization is
  * `F.wsTokens` (trim, split on whitespace runs, drop empties).
  *
  * The generator itself is interpreted (GenerateExec), but it runs ONCE
  * per document — not per token — so the CodegenFallback-inlining pitfall
  * that rules out array-lambda shingling (SNIPPETS/t4 notes) does not
  * apply.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression
    with Generator
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_shingles expects a string column, got ${other.simpleString}"
        )
    }

  override def elementSchema: StructType = StructType(
    Seq(
      StructField("shingle", LongType, nullable = false),
      StructField("sz", IntegerType, nullable = false),
      StructField("rn", IntegerType, nullable = false)
    )
  )

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Iterator.empty
    val h = ShingleHashing.hashSequence(t.asInstanceOf[UTF8String], n)
    val m = h.length
    if (m == 0) return Iterator.empty
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val arr = new Array[Long](m)
    var cnt = 0
    var i = 0
    while (i < m) {
      if (seen.add(h(i))) {
        arr(cnt) = h(i)
        cnt += 1
      }
      i += 1
    }
    java.util.Arrays.sort(arr, 0, cnt)
    val sz = cnt
    (0 until sz).iterator.map(j => InternalRow(arr(j), sz, j + 1))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

private[graft] object ShingleHashing {
  /** Positional (NOT deduped) n-gram shingle hash sequence of a text —
    * exactly `xxhash64(concat_ws(' ', w_i..w_{i+n-1}))` per position. */
  def hashSequence(text: UTF8String, n: Int): Array[Long] = {
    val toks = text.toString.trim.split("\\s+").filter(_.nonEmpty)
    val m = toks.length - n + 1
    if (m <= 0) return Array.emptyLongArray
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      sb.append(toks(i))
      var k = 1
      while (k < n) {
        sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val u = UTF8String.fromString(sb.toString)
      out(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    out
  }

  /** Positional n-gram hash sequence under the CROSS-ENGINE hash: the
    * first 4 bytes (big-endian) of `md5(concat_ws(' ', w_i..w_{i+n-1}))`,
    * i.e. the integer value of the first 8 hex chars — computable
    * bit-identically in any engine with an md5() (DuckDB: instr-formula
    * over `substr(md5(g), 1, 8)`). Used by [[WinnowFingerprints]] so t6 is
    * fully oracle-checkable; [[ShingleHashes]] keeps xxhash64 (faster, and
    * t4/v4 are verified through exact set-equality stages instead). */
  def md5PrefixSequence(text: UTF8String, n: Int): Array[Long] = {
    val toks = text.toString.trim.split("\\s+").filter(_.nonEmpty)
    val m = toks.length - n + 1
    if (m <= 0) return Array.emptyLongArray
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      sb.append(toks(i))
      var k = 1
      while (k < n) {
        sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    out
  }
}

/** Custom Generator for winnowing fingerprints (the MOSS scheme): slide a
  * window of `w` consecutive n-gram shingle hashes, keep each FULL window's
  * minimum (plus the clamped position-0 minimum for short documents),
  * dedupe, and emit `(fp: long, nfp: int, rn: int)` sorted by ascending
  * fingerprint — same annotations as [[ShingleHashes]].
  *
  * Replaces the t6 build that needed a doc_id shuffle plus three window
  * passes (lead-assembly, frame min, frame count) and a lag-dedupe before
  * the fingerprint index could form. Semantics are identical to that
  * pipeline (parity asserted in ShingleGeneratorSpec): full windows are
  * positions `pos <= m - w`; a document with fewer than `w` shingles keeps
  * the pos-0 minimum of whatever exists.
  *
  * Hash: [[ShingleHashing.md5PrefixSequence]] (md5 first-4-bytes), NOT
  * xxhash64 — chosen so the whole t6 pipeline is reproducible in DuckDB
  * and therefore hash-checked by the oracle rather than rows-only. md5 is
  * ~5x slower per gram than XXH64 but runs once per shingle inside a
  * pipelined generate step; at 100 TB the build stays scan-bound.
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression
    with Generator
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_winnow expects a string column, got ${other.simpleString}"
        )
    }

  override def elementSchema: StructType = StructType(
    Seq(
      StructField("fp", LongType, nullable = false),
      StructField("nfp", IntegerType, nullable = false),
      StructField("rn", IntegerType, nullable = false)
    )
  )

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Iterator.empty
    val h = ShingleHashing.md5PrefixSequence(t.asInstanceOf[UTF8String], n)
    val m = h.length
    if (m == 0) return Iterator.empty
    val seen = new java.util.HashSet[java.lang.Long]()
    val kept = new Array[Long](m)
    var cnt = 0
    var pos = 0
    while (pos < m) {
      if (pos <= m - w || pos == 0) {
        var mn = h(pos)
        var j = pos + 1
        val end = math.min(pos + w, m)
        while (j < end) {
          if (h(j) < mn) mn = h(j)
          j += 1
        }
        if (seen.add(mn)) {
          kept(cnt) = mn
          cnt += 1
        }
      }
      pos += 1
    }
    java.util.Arrays.sort(kept, 0, cnt)
    val nfp = cnt
    (0 until nfp).iterator.map(j => InternalRow(kept(j), nfp, j + 1))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Feature-hashing trigram featurizer — `graft_gram_embed(text)` returns a
  * 64-dim float embedding where each word-trigram's cross-engine hash
  * ([[ShingleHashing.md5PrefixSequence]], t6's md5 first-4-bytes scheme)
  * scatters a ±1 count into dim `h mod 64` with sign from bit 6
  * (`(h / 64) mod 2`). Cosine between two such vectors tracks trigram
  * multiset overlap — near-dup documents land at cos ≥ ~0.9 while
  * unrelated documents (few shared word trigrams) sit near 0 — giving the
  * NEAR-ORTHOGONAL background geometry that [[graft.operators.VectorOps
  * .bandedCandidates]] needs to prune (m7's byte-histogram stub sits at a
  * ~0.7 background where no band geometry separates; this featurizer is
  * the separable stand-in a real media encoder would provide).
  *
  * All accumulated values are small exact integers, so the dot/norm
  * arithmetic downstream is order-independent and bit-identical across
  * engines — the DuckDB oracle rebuilds the embedding with the same md5
  * hex-prefix formula. Interpreted (CodegenFallback), but like the
  * generators above it runs ONCE per document inside a scan-bound
  * featurize stage, not per token. A document with fewer than 3 words
  * (no trigrams) embeds as the zero vector; callers filter on norm > 0,
  * matching the oracle's implicit drop of trigram-less docs. */
case class GramEmbed(child: Expression, dims: Int = 64)
    extends UnaryExpression
    with CodegenFallback {

  require(dims > 0, s"graft_gram_embed: dims must be positive, got $dims")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_gram_embed expects a string column, got ${other.simpleString}"
        )
    }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def prettyName: String = "graft_gram_embed"

  override protected def nullSafeEval(input: Any): Any = {
    val h = ShingleHashing.md5PrefixSequence(input.asInstanceOf[UTF8String], 3)
    val acc = new Array[Double](dims)
    var i = 0
    while (i < h.length) {
      // h ∈ [0, 2^32): dim and sign are both non-negative arithmetic
      val d = (h(i) % dims).toInt
      acc(d) += (if ((h(i) / dims) % 2 == 0L) 1.0 else -1.0)
      i += 1
    }
    val out = new Array[Float](dims)
    var j = 0
    while (j < dims) {
      out(j) = acc(j).toFloat
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramEmbed =
    copy(child = newChild)
}

object GramEmbed {
  /** SQL-facing construction — `graft_gram_embed(text[, dims])`, the
    * optional dims a foldable int literal (default 64, the m7b/m8 oracle
    * contract; higher dims is SCALING.md's decade-exponent lever: less
    * collision noise lifts the true-pair cosine floor, letting the band
    * solver design at a higher τ with far fewer planes). */
  def fromArgs(exprs: Seq[Expression]): GramEmbed = exprs match {
    case Seq(c)    => GramEmbed(c)
    case Seq(c, d) => GramEmbed(c, foldInt(d, "graft_gram_embed dims"))
    case _ =>
      throw new IllegalArgumentException(
        s"graft_gram_embed expects 1 or 2 arguments, got ${exprs.length}"
      )
  }

  private[functions] def foldInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval(null) match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long    => l.intValue()
      case other =>
        throw new IllegalArgumentException(s"$what must be an int, got $other")
    }
  }
}
