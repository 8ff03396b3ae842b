package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Expression, Generator, UnaryExpression, XXH64
}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{
  IntegerType, LongType, StringType, StructField, StructType
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

private[functions] object ShingleHashing {
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
