package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** merges.txt interchange — the file-format boundary for the BPE family
  * (the `JsonlCorpus` pattern: explicit format, loud failure, round-trip
  * contract). A trained tokenizer ships its merge list as a plain text
  * file: an optional `#`-comment header, then one rank-ordered
  * `left right` pair per line — the format GPT-2's vocabulary and every
  * Hugging-Face-style tokenizer distribute. t62's in-engine trainer
  * produces the same artifact as a ledger; this object is how a
  * third-party tokenizer's published merges enter `graft_bpe_encode`
  * (and how t62's training leaves the engine for external consumers).
  *
  * Strictness: a malformed line (not exactly two space-separated,
  * non-empty fields) fails with its line number; a symbol containing
  * whitespace or the NUL pack separator can't survive the format and
  * fails at WRITE time rather than corrupting the file; an empty merge
  * list fails loudly — a tokenizer with zero merges is a byte-level
  * tokenizer, not a trained artifact, and silently encoding with it
  * would "work" while producing garbage budgets.
  */
object BpeMerges {

  /** The separator `graft_bpe_encode` takes merge entries in
    * (`left NUL right`) — kept here so the packed form has one owner. */
  val packSep = 0.toChar.toString

  /** Write a rank-ordered merge list as merges.txt. Overwrites. */
  def write(merges: Seq[(String, String)], path: String): Unit = {
    require(merges.nonEmpty, "BpeMerges.write: refusing to write an empty merge list")
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(
        l.nonEmpty && r.nonEmpty,
        s"BpeMerges.write: empty symbol at rank ${i + 1}"
      )
      require(
        !(l + r).exists(c => c.isWhitespace || c == 0.toChar),
        s"BpeMerges.write: symbol with whitespace/NUL at rank ${i + 1} " +
          "cannot be represented in the space-separated merges.txt format"
      )
    }
    val lines = "#version: 0.2" +: merges.map { case (l, r) => s"$l $r" }
    Files.write(
      Paths.get(path),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    )
  }

  /** Read a merges.txt back as the rank-ordered pair list. ONLY line 1
    * may be a `#`-prefixed header (the `#version` convention — what
    * write() always emits); blank lines are skipped; anything else that
    * is not exactly `left right` fails with its line number. A `#` on
    * any later line is DATA: code corpora legitimately produce merges
    * whose left symbol starts with `#` (write() accepts them), and the
    * earlier skip-every-`#`-line rule silently dropped those merges on
    * readback — the list shrank with no error and every downstream
    * `graft_bpe_encode` budget was computed against a corrupted
    * tokenizer (round-12 advice #1). Residual ambiguity is the FORMAT's,
    * not ours: a headerless external file whose first merge starts with
    * `#` is indistinguishable from a header line ("#version: 0.2" parses
    * as two fields too) — write() always emits the header, so every
    * graft-written file round-trips exactly. */
  def read(path: String): Seq[(String, String)] = {
    val raw = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala.toSeq
    val merges = raw.zipWithIndex.flatMap { case (line, i) =>
      if ((i == 0 && line.startsWith("#")) || line.trim.isEmpty) None
      else {
        val parts = line.split(" ", -1)
        require(
          parts.length == 2 && parts.forall(_.nonEmpty),
          s"BpeMerges.read: $path line ${i + 1} is not a 'left right' " +
            s"merge pair: '$line'"
        )
        Some((parts(0), parts(1)))
      }
    }
    require(merges.nonEmpty, s"BpeMerges.read: $path contains no merge pairs")
    merges
  }

  /** The NUL-packed form `graft_bpe_encode`'s literal array argument
    * takes — one entry per merge, rank order preserved. */
  def packed(merges: Seq[(String, String)]): Array[String] =
    merges.map { case (l, r) => l + packSep + r }.toArray
}
