package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{
  Expression, QuaternaryExpression, TernaryExpression
}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native expressions for the product-quantization (v11) hot path.
  *
  * The first PQ implementation unrolled the per-subspace argmin/ADC into
  * ~128 separate Catalyst nodes (`array_min` over struct arrays, `slice`,
  * `element_at` over map literals). That tree evaluates at ~120 µs/row —
  * slice allocates a fresh subvector array per term and every struct
  * comparison boxes. These two expressions collapse the whole computation
  * into one tight codegen loop each, no per-row allocation beyond the
  * output code array.
  *
  * Both take the centroid codebook as two parallel LITERAL children:
  *   cents: array<array<array<float>>>  — [subspace][entry][dim]
  *   cids:  array<array<int>>           — [subspace][entry], ascending
  * so a subspace whose Lloyd pass emptied a cluster still matches the
  * DuckDB oracle, which materializes only present (cid, centroid) rows.
  *
  * Arithmetic is IDENTICAL to the unrolled form (and the oracle SQL):
  * squared L2 per subspace as Σ((double)v_i − (double)c_i)² in index
  * order, argmin tie-break "dist2 asc, cid asc", ADC summed in subspace
  * order (left-assoc double adds) — bit-identical across engines.
  */
case class PqEncode(vec: Expression, cents: Expression, cids: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = cids

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cents.dataType, cids.dataType) match {
      case (
            ArrayType(FloatType, _),
            ArrayType(ArrayType(ArrayType(FloatType, _), _), _),
            ArrayType(ArrayType(IntegerType, _), _)
          ) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_pq_encode expects (array<float>, array<array<array<float>>>, " +
            s"array<array<int>>), got $other"
        )
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(v0: Any, c0: Any, i0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val cs = c0.asInstanceOf[ArrayData]
    val ids = i0.asInstanceOf[ArrayData]
    val nSub = cs.numElements()
    val subDim = v.numElements() / nSub
    val out = new Array[Int](nSub)
    var s = 0
    while (s < nSub) {
      val subC = cs.getArray(s)
      val subI = ids.getArray(s)
      var bestD = Double.PositiveInfinity
      var bestCid = Int.MaxValue
      var j = 0
      val m = subC.numElements()
      while (j < m) {
        val c = subC.getArray(j)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val dd = v.getFloat(s * subDim + i).toDouble - c.getFloat(i).toDouble
          acc += dd * dd
          i += 1
        }
        val cid = subI.getInt(j)
        if (acc < bestD || (acc == bestD && cid < bestCid)) {
          bestD = acc; bestCid = cid
        }
        j += 1
      }
      out(s) = bestCid
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (v, cs, ids) => {
        val ad = classOf[ArrayData].getName
        val nSub = ctx.freshName("peNSub")
        val subDim = ctx.freshName("peSubDim")
        val out = ctx.freshName("peOut")
        val s = ctx.freshName("peS")
        val subC = ctx.freshName("peSubC")
        val subI = ctx.freshName("peSubI")
        val bestD = ctx.freshName("peBestD")
        val bestCid = ctx.freshName("peBestCid")
        val m = ctx.freshName("peM")
        val j = ctx.freshName("peJ")
        val c = ctx.freshName("peC")
        val acc = ctx.freshName("peAcc")
        val i = ctx.freshName("peI")
        val dd = ctx.freshName("peDd")
        val cid = ctx.freshName("peCid")
        s"""
        int $nSub = $cs.numElements();
        int $subDim = $v.numElements() / $nSub;
        int[] $out = new int[$nSub];
        for (int $s = 0; $s < $nSub; $s++) {
          $ad $subC = $cs.getArray($s);
          $ad $subI = $ids.getArray($s);
          double $bestD = Double.POSITIVE_INFINITY;
          int $bestCid = Integer.MAX_VALUE;
          int $m = $subC.numElements();
          for (int $j = 0; $j < $m; $j++) {
            $ad $c = $subC.getArray($j);
            double $acc = 0.0;
            for (int $i = 0; $i < $subDim; $i++) {
              double $dd = (double) $v.getFloat($s * $subDim + $i)
                - (double) $c.getFloat($i);
              $acc += $dd * $dd;
            }
            int $cid = $subI.getInt($j);
            if ($acc < $bestD || ($acc == $bestD && $cid < $bestCid)) {
              $bestD = $acc; $bestCid = $cid;
            }
          }
          $out[$s] = $bestCid;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
        """
      }
    )

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression
  ): PqEncode = copy(vec = newFirst, cents = newSecond, cids = newThird)
}

/** Asymmetric distance (ADC): query stays full-precision, candidate is
  * reconstructed subspace-wise from its PQ code. Missing code ids fail
  * fast, mirroring the ANSI `element_at` the unrolled form relied on.
  */
case class PqAdcDistance(
    qe: Expression,
    code: Expression,
    cents: Expression,
    cids: Expression
) extends QuaternaryExpression {

  override def first: Expression = qe
  override def second: Expression = code
  override def third: Expression = cents
  override def fourth: Expression = cids

  override def checkInputDataTypes(): TypeCheckResult =
    (qe.dataType, code.dataType, cents.dataType, cids.dataType) match {
      case (
            ArrayType(FloatType, _),
            ArrayType(IntegerType, _),
            ArrayType(ArrayType(ArrayType(FloatType, _), _), _),
            ArrayType(ArrayType(IntegerType, _), _)
          ) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_pq_adc expects (array<float>, array<int>, " +
            s"array<array<array<float>>>, array<array<int>>), got $other"
        )
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(q0: Any, k0: Any, c0: Any, i0: Any): Any = {
    val q = q0.asInstanceOf[ArrayData]
    val code = k0.asInstanceOf[ArrayData]
    val cs = c0.asInstanceOf[ArrayData]
    val ids = i0.asInstanceOf[ArrayData]
    val nSub = cs.numElements()
    val subDim = q.numElements() / nSub
    var total = 0.0
    var s = 0
    while (s < nSub) {
      val cid = code.getInt(s)
      val subI = ids.getArray(s)
      var jf = -1
      var j = 0
      val m = subI.numElements()
      while (jf < 0 && j < m) {
        if (subI.getInt(j) == cid) jf = j
        j += 1
      }
      if (jf < 0)
        throw new IllegalStateException(s"graft_pq_adc: code id $cid absent from codebook")
      val c = cs.getArray(s).getArray(jf)
      var acc = 0.0
      var i = 0
      while (i < subDim) {
        val dd = q.getFloat(s * subDim + i).toDouble - c.getFloat(i).toDouble
        acc += dd * dd
        i += 1
      }
      total += acc
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (q, code, cs, ids) => {
        val ad = classOf[ArrayData].getName
        val nSub = ctx.freshName("paNSub")
        val subDim = ctx.freshName("paSubDim")
        val total = ctx.freshName("paTotal")
        val s = ctx.freshName("paS")
        val cid = ctx.freshName("paCid")
        val subI = ctx.freshName("paSubI")
        val jf = ctx.freshName("paJf")
        val j = ctx.freshName("paJ")
        val m = ctx.freshName("paM")
        val c = ctx.freshName("paC")
        val acc = ctx.freshName("paAcc")
        val i = ctx.freshName("paI")
        val dd = ctx.freshName("paDd")
        s"""
        int $nSub = $cs.numElements();
        int $subDim = $q.numElements() / $nSub;
        double $total = 0.0;
        for (int $s = 0; $s < $nSub; $s++) {
          int $cid = $code.getInt($s);
          $ad $subI = $ids.getArray($s);
          int $jf = -1;
          int $m = $subI.numElements();
          for (int $j = 0; $jf < 0 && $j < $m; $j++) {
            if ($subI.getInt($j) == $cid) $jf = $j;
          }
          if ($jf < 0) {
            throw new IllegalStateException(
              "graft_pq_adc: code id " + $cid + " absent from codebook");
          }
          $ad $c = $cs.getArray($s).getArray($jf);
          double $acc = 0.0;
          for (int $i = 0; $i < $subDim; $i++) {
            double $dd = (double) $q.getFloat($s * $subDim + $i)
              - (double) $c.getFloat($i);
            $acc += $dd * $dd;
          }
          $total += $acc;
        }
        ${ev.value} = $total;
        """
      }
    )

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression,
      newFourth: Expression
  ): PqAdcDistance =
    copy(qe = newFirst, code = newSecond, cents = newThird, cids = newFourth)
}
