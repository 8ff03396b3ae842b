package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Paged id-bitmap: the mergeable EXACT-distinct partial.
  *
  * e12 stores HLL partials because exact distinct counts are non-additive
  * — but that's only true of the COUNTS. The underlying id SETS merge
  * losslessly, and for integer id domains a bitmap is the classic compact
  * set representation (one bit per id, OR = union, popcount = answer).
  * These helpers implement the set algebra the two Aggregators below and
  * the streaming path share.
  *
  * Layout: ids are split into 4096-id pages (page = id >> 12); each
  * touched page holds 64 words = 520 serialized bytes (8-byte page index
  * + 64 little-endian words, pages sorted by index — a canonical byte
  * form, so equal sets always serialize identically). State per group is
  * O(touched pages), NOT O(id-domain): 1M contiguous users ≈ 64 KB. For
  * adversarially sparse domains (one id per page) the right container is
  * a roaring-style sorted-offset array per page — same page split, same
  * merge algebra, smaller payload; the dense page is the honest default
  * for clustered id spaces like user/document ids.
  */
object Bitmap64 {
  val PageBits = 12
  val WordsPerPage = 64
  val PageBytes: Int = 8 + WordsPerPage * 8
  type Pages = Map[Long, Array[Long]]

  /** Set one id bit. Mutates the page array in place when present (the
    * buffer is aggregator-private between serializations); allocates a
    * fresh page otherwise. Negative ids are a caller bug — fail loudly. */
  def add(b: Pages, id: Long): Pages = {
    require(id >= 0, s"bitmap ids must be non-negative, got $id")
    val p = id >> PageBits
    val off = (id & ((1L << PageBits) - 1)).toInt
    val w = off >> 6
    val m = 1L << (off & 63)
    b.get(p) match {
      case Some(words) => words(w) |= m; b
      case None =>
        val words = new Array[Long](WordsPerPage)
        words(w) |= m
        b.updated(p, words)
    }
  }

  /** Union: OR b's pages into a (in place where a already has the page). */
  def or(a: Pages, b: Pages): Pages =
    b.foldLeft(a) { case (acc, (p, words)) =>
      acc.get(p) match {
        case Some(w0) =>
          var i = 0
          while (i < WordsPerPage) { w0(i) |= words(i); i += 1 }
          acc
        case None => acc.updated(p, words)
      }
    }

  def serialize(b: Pages): Array[Byte] = {
    val buf = ByteBuffer
      .allocate(b.size * PageBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.keys.toArray.sorted.foreach { p =>
      buf.putLong(p)
      val words = b(p)
      var i = 0
      while (i < WordsPerPage) { buf.putLong(words(i)); i += 1 }
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Pages = {
    require(
      bytes.length % PageBytes == 0,
      s"corrupt bitmap partial: ${bytes.length} bytes is not a page multiple"
    )
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    (0 until bytes.length / PageBytes).map { _ =>
      val p = buf.getLong
      val words = Array.fill(WordsPerPage)(buf.getLong)
      p -> words
    }.toMap
  }

  def cardinality(b: Pages): Long = {
    var n = 0L
    b.valuesIterator.foreach { words =>
      var i = 0
      while (i < WordsPerPage) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    n
  }

  /** |A ∩ B| directly on two SERIALIZED bitmaps: pages are sorted by
    * index in the canonical form, so a single merge walk ANDs matching
    * pages with zero deserialization or allocation — the shape the
    * codegen path calls per row. AND-with-self is cardinality. */
  def andCountBytes(a: Array[Byte], b: Array[Byte]): Long = {
    require(
      a.length % PageBytes == 0 && b.length % PageBytes == 0,
      s"corrupt bitmap partial: ${a.length}/${b.length} bytes"
    )
    val ba = ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val (na, nb) = (a.length / PageBytes, b.length / PageBytes)
    var (i, j) = (0, 0)
    var n = 0L
    while (i < na && j < nb) {
      val pa = ba.getLong(i * PageBytes)
      val pb = bb.getLong(j * PageBytes)
      if (pa < pb) i += 1
      else if (pb < pa) j += 1
      else {
        var w = 0
        while (w < WordsPerPage) {
          n += java.lang.Long.bitCount(
            ba.getLong(i * PageBytes + 8 + w * 8) &
              bb.getLong(j * PageBytes + 8 + w * 8)
          )
          w += 1
        }
        i += 1; j += 1
      }
    }
    n
  }
}

/** `graft_bitmap_and_count(bitmap, bitmap) -> bigint` — exact |A ∩ B|
  * over two serialized [[Bitmap64]] partials as a native expression:
  * intersections are the set operation unions (e14/e15) can't express,
  * and they unlock retention/overlap analytics directly on stored
  * partials. Codegen emits one static call into the merge-walk above —
  * no boxing, no per-row driver logic; evaluated on partial-grain rows
  * (weeks × weeks), never the raw stream. */
case class BitmapAndCount(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression
) extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_and_count expects two binary arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})"
      )

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bitmap_and_count"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Bitmap64.andCountBytes(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"${ev.value} = graft.functions.Bitmap64.andCountBytes($a, $b);"
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): BitmapAndCount = copy(left = newLeft, right = newRight)
}

/** Stage-1 aggregator: raw ids → serialized bitmap partial (the STORED
  * per-(day, key) state). Partial aggregation gives map-side combine for
  * free: each executor ships one O(pages) buffer per group, never rows. */
class BitmapBuildAggregator extends Aggregator[Long, Bitmap64.Pages, Array[Byte]] {
  override def zero: Bitmap64.Pages = Map.empty
  override def reduce(b: Bitmap64.Pages, id: Long): Bitmap64.Pages =
    Bitmap64.add(b, id)
  override def merge(a: Bitmap64.Pages, b: Bitmap64.Pages): Bitmap64.Pages =
    Bitmap64.or(a, b)
  override def finish(b: Bitmap64.Pages): Array[Byte] = Bitmap64.serialize(b)
  override def bufferEncoder: Encoder[Bitmap64.Pages] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
}

/** Stage-2 aggregator: serialized partials → EXACT distinct count of
  * their union. The answer to any date-range distinct query from stored
  * kilobyte partials — no rescan of raw events, and unlike e12's HLL no
  * error bar anywhere. */
class BitmapMergeCountAggregator extends Aggregator[Array[Byte], Bitmap64.Pages, Long] {
  override def zero: Bitmap64.Pages = Map.empty
  override def reduce(b: Bitmap64.Pages, bytes: Array[Byte]): Bitmap64.Pages =
    Bitmap64.or(b, Bitmap64.deserialize(bytes))
  override def merge(a: Bitmap64.Pages, b: Bitmap64.Pages): Bitmap64.Pages =
    Bitmap64.or(a, b)
  override def finish(b: Bitmap64.Pages): Long = Bitmap64.cardinality(b)
  override def bufferEncoder: Encoder[Bitmap64.Pages] = ExpressionEncoder()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder()
}
