package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{
  ArrayType, DoubleType, FloatType, LongType, StructField, StructType
}

/** Custom Catalyst Generator: Maximal Marginal Relevance selection over one
  * query's candidate list — the diversity re-rank a retrieval pipeline runs
  * AFTER ANN so the returned set is not k near-copies of the same passage.
  *
  * Input: `array<struct<vec_id: long, rel: double, embedding: array<float>>>`
  * (a query's top-N candidates with their relevance scores). Output rows
  * `(rnk: long, neighbor_id: long, score: double)` for the `k` MMR picks:
  * pick 1 maximizes raw relevance; pick i>1 maximizes
  * `lam * rel(c) - (1-lam) * max_{s in selected} cos(c, s)`. Ties break on
  * ascending id, and the argmax is taken over the 6-dp ROUNDED score
  * (half-away-from-zero, DuckDB's rounding) so cross-engine ulp noise in
  * the unrounded expression can never flip a pick against the oracle.
  *
  * Why a Generator: MMR is sequential in k BY DEFINITION (each pick changes
  * the next pick's penalty), so the per-query selection is irreducibly
  * imperative — but queries are independent, so the loop belongs INSIDE a
  * per-row generate step over a `collect_list`-packed candidate struct, not
  * in k rounds of join+window (k extra shuffles) and not on the driver.
  * Cost is O(k·N) dot products per query over N<=20 candidates, evaluated
  * once per query row; the plan around it is one groupBy shuffle.
  *
  * Cosines are computed with the exact accumulation form of
  * [[DotProductFloat]] (double products, index order) so they are
  * bit-identical to the DuckDB oracle's `list_sum(list_transform(...))`.
  */
case class MmrSelect(child: Expression, k: Int, lam: Double)
    extends UnaryExpression
    with Generator
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(f0, f1, f2)), _)
          if f0.dataType == LongType && f1.dataType == DoubleType &&
            (f2.dataType == ArrayType(FloatType, false) ||
              f2.dataType == ArrayType(FloatType, true)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          "graft_mmr expects array<struct<long, double, array<float>>>, got " +
            other.simpleString
        )
    }

  override def elementSchema: StructType = StructType(
    Seq(
      StructField("rnk", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false)
    )
  )

  /** DuckDB-compatible round-half-away-from-zero at 6 dp. */
  private def round6(x: Double): Double =
    if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
    else math.ceil(x * 1e6 - 0.5) / 1e6

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return Iterator.empty

    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val vecs = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rel(i) = row.getDouble(1)
      vecs(i) = row.getArray(2).toFloatArray()
      i += 1
    }
    // ascending-id scan order makes the strict-> argmax tie-break on id
    val order = (0 until n).sortBy(ids(_)).toArray
    val norms = vecs.map(x => math.sqrt(dot(x, x)))

    val taken = new Array[Boolean](n)
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = Vector.newBuilder[InternalRow]
    var picks = 0
    while (picks < math.min(k, n)) {
      var best = -1
      var bestKey = Double.NegativeInfinity
      var emit = 0.0
      var j = 0
      while (j < n) {
        val c = order(j)
        if (!taken(c)) {
          val s =
            if (picks == 0) rel(c)
            else lam * rel(c) - (1.0 - lam) * maxSim(c)
          // pick 1 compares raw relevance; later picks compare the rounded
          // MMR score — both exactly as the recursive-CTE oracle orders
          val key = if (picks == 0) s else round6(s)
          if (key > bestKey) {
            bestKey = key
            best = c
            emit = round6(s)
          }
        }
        j += 1
      }
      taken(best) = true
      out += InternalRow(picks + 1L, ids(best), emit)
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          val sim = dot(vecs(c), vecs(best)) / (norms(c) * norms(best))
          if (sim > maxSim(c)) maxSim(c) = sim
        }
        c += 1
      }
      picks += 1
    }
    out.result()
  }

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}
