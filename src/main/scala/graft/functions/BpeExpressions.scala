package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Precompiled merge table for [[GraftBpeEncode]] — built once per
  * expression instance per JVM (the analogue of BandHashesFloat's plane
  * table) and shared across every row the operator touches.
  *
  * `mergesInOrder` is the trained ledger: rank-ordered `l NUL r` entries
  * (NUL = U+0000, which cannot occur inside a symbol — symbols come from
  * corpus text). The same pair MAY appear under several ranks (a pair can
  * re-emerge during training after later merges recreate its left symbol);
  * the lookup therefore yields ALL ranks of a pair, ascending, so the
  * encode loop can honor whichever one the replace chain would hit next.
  */
final class BpeRanks(mergesInOrder: Array[String]) extends Serializable {

  val size: Int = mergesInOrder.length

  val lefts: Array[String] = new Array[String](size)
  val rights: Array[String] = new Array[String](size)
  val outs: Array[String] = new Array[String](size)

  {
    var i = 0
    while (i < size) {
      val m = mergesInOrder(i)
      val sep = m.indexOf('\u0000')
      require(
        sep > 0 && sep < m.length - 1 && m.indexOf('\u0000', sep + 1) < 0,
        s"graft_bpe_encode: merge entry $i is not 'l NUL r' with non-empty halves"
      )
      lefts(i) = m.substring(0, sep)
      rights(i) = m.substring(sep + 1)
      outs(i) = lefts(i) + rights(i)
      i += 1
    }
  }

  /** pair key -> its ranks ascending. Rebuilt lazily per JVM (transient:
    * only the string arrays ship with the serialized expression). */
  @transient private lazy val rankMap: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]](size * 2)
    var i = 0
    while (i < size) {
      val key = lefts(i) + "\u0000" + rights(i)
      val prev = m.get(key)
      m.put(key, if (prev == null) Array(i) else prev :+ i)
      i += 1
    }
    m
  }

  /** Smallest rank of pair (l, r) that is >= from, or Int.MaxValue. */
  def rankAtLeast(l: String, r: String, from: Int): Int = {
    val ranks = rankMap.get(l + "\u0000" + r)
    if (ranks == null) Int.MaxValue
    else {
      var i = 0
      while (i < ranks.length) {
        if (ranks(i) >= from) return ranks(i)
        i += 1
      }
      Int.MaxValue
    }
  }
}

/** The per-row BPE encode kernel — a plain static method so generated
  * code calls straight into compiled bytecode (the merge loop never
  * enters Janino source, only the one-line call does).
  */
object BpeKernel {

  /** Apply a trained merge list to one word with REPLACE-CHAIN semantics:
    * for each merge in rank order, one greedy left-to-right
    * non-overlapping pass — exactly `foldLeft(replace)` over the wrapped
    * symbol string (t63's declared contract, and DuckDB `replace`'s
    * semantics, so the oracle is shared). NOTE this is deliberately NOT
    * the lowest-rank-FIRST loop some tokenizers run: if a later merge
    * recreates an earlier merge's pair, the chain does not revisit it.
    * The two differ only on such recreated pairs; the chain is the
    * contract here because it is oracle-expressible on both engines.
    *
    * Instead of walking all N merges (the replace chain's plan does,
    * one node each), the loop keeps a forward-only rank pointer and
    * repeatedly applies the smallest applicable rank >= pointer: ranks
    * skipped in between have no occurrence in the current state, which
    * is the same state the chain would see when reaching them, so the
    * chain would skip them too. Work is O(word² ) hash probes worst
    * case, INDEPENDENT of N — a 50k-merge vocabulary costs the same per
    * word as a 3-merge one.
    *
    * Symbols are Unicode code points at the base (matching Spark's and
    * DuckDB's character-indexed `substring`), merged strings after.
    * Contract note: merge-list symbols cannot contain U+0000 (BpeRanks
    * rejects entries with more than one separator), and corpus text is
    * assumed free of it (t62's existing control-char assumption) — a
    * word symbol containing NUL could alias another pair's rank-map key,
    * costing a wasted loop iteration (the apply pass re-checks the real
    * pair, so the OUTPUT stays correct and the pointer still advances).
    */
  def encode(word: UTF8String, ranks: BpeRanks): ArrayData = {
    val s = word.toString
    var n = 0
    val syms = new Array[String](s.codePointCount(0, s.length))
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      val cc = Character.charCount(cp)
      syms(n) = s.substring(ci, ci + cc)
      n += 1
      ci += cc
    }
    var pointer = 0
    var done = ranks.size == 0
    while (!done && n >= 2) {
      var best = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val r = ranks.rankAtLeast(syms(j), syms(j + 1), pointer)
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val l = ranks.lefts(best)
        val r = ranks.rights(best)
        val out = ranks.outs(best)
        var w = 0
        var k = 0
        while (k < n) {
          if (k < n - 1 && syms(k) == l && syms(k + 1) == r) {
            syms(w) = out
            k += 2
          } else {
            syms(w) = syms(k)
            k += 1
          }
          w += 1
        }
        n = w
        pointer = best + 1
        if (pointer >= ranks.size) done = true
      }
    }
    val result = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      result(i) = UTF8String.fromString(syms(i))
      i += 1
    }
    new GenericArrayData(result)
  }
}

/** `graft_bpe_encode(word, merges) -> array<string>` — tokenize one word
  * under a trained BPE merge list, as ONE codegen'd function instead of
  * t63's one-`replace`-plan-node-per-merge foldLeft (which cannot survive
  * analysis/codegen past a few hundred merges; a real tokenizer ships
  * 10k–50k).
  *
  * `merges` must be FOLDABLE (array<string> of rank-ordered `l NUL r`
  * entries): the trained ledger is an artifact riding the plan as a
  * literal — like BandHashesFloat's plane table, it compiles into a
  * reference object, not a join side. Bit-equal to the replace chain by
  * construction (see [[BpeKernel.encode]]); pinned by BpeEncodeSpec's
  * differential and the shared t63/t64 oracle.
  */
case class GraftBpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ranks = new BpeRanks(merges.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_encode expects a string word, got ${other.simpleString}"
        )
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.encode(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      w => {
        val rk = ctx.addReferenceObj("graftBpeRanks", ranks, "graft.functions.BpeRanks")
        s"${ev.value} = graft.functions.BpeKernel.encode($w, $rk);"
      }
    )

  override protected def withNewChildInternal(newChild: Expression): GraftBpeEncode =
    copy(child = newChild)
}

object GraftBpeEncode {

  /** Builder shared by the session registration and the extension
    * injection: arg 1 is the word column, arg 2 the foldable merge-list
    * literal (evaluated at plan time — the ledger is plan state, not row
    * state). */
  def build(exprs: Seq[Expression]): GraftBpeEncode = {
    require(
      exprs.length == 2,
      s"graft_bpe_encode takes 2 arguments (word, merges array), got ${exprs.length}"
    )
    require(
      exprs(1).foldable,
      "graft_bpe_encode: the merge list must be foldable (a literal array<string>)"
    )
    val arr = exprs(1).eval()
    require(arr != null, "graft_bpe_encode: the merge list must not be null")
    val merges = arr
      .asInstanceOf[ArrayData]
      .toArray[UTF8String](StringType)
      .map(u => if (u == null) null else u.toString)
    require(!merges.contains(null), "graft_bpe_encode: merge entries must not be null")
    GraftBpeEncode(exprs(0), merges.toSeq)
  }
}
