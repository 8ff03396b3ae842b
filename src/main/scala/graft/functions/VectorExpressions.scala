package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, ExpressionInfo
}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the similarity-search hot path.
  *
  * `F.dot` (zip_with + aggregate) materializes an intermediate 64-element
  * array per evaluation — at 12.5M candidate pairs that allocation dominates
  * the brute-force scorers. This expression evaluates the dot product in a
  * tight codegen loop over the two ArrayData buffers, no allocation.
  *
  * Semantics are IDENTICAL to the fold form: products and accumulation in
  * double, index order — so results stay bit-identical to the DuckDB oracle
  * computation. Assumes non-null elements (embedding vectors).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall {
      _.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two array<float> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})"
      )
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        int graftN = java.lang.Math.min($a.numElements(), $b.numElements());
        double graftAcc = 0.0;
        for (int graftI = 0; graftI < graftN; graftI++) {
          graftAcc += (double) $a.getFloat(graftI) * (double) $b.getFloat(graftI);
        }
        ${ev.value} = graftAcc;
      """
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): DotProductFloat = copy(left = newLeft, right = newRight)
}

/** Registration for the native functions — either per-session at runtime
  * ([[GraftFunctions.register]]) or via `spark.sql.extensions=
  * graft.functions.GraftExtensions` for cluster-wide injection.
  */
object GraftFunctions {
  val dotInfo = new ExpressionInfo(
    classOf[DotProductFloat].getName,
    "graft_dot"
  )

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      (exprs: Seq[Expression]) => DotProductFloat(exprs(0), exprs(1)),
      "built-in"
    )
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        GraftFunctions.dotInfo,
        (exprs: Seq[Expression]) => DotProductFloat(exprs(0), exprs(1))
      )
    )
}
