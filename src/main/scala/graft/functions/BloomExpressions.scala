package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen membership probe against a driver-built [[BloomFilter]] — the
  * prefilter shape a 100 TB decontamination/join-pruning pass needs: the
  * filter is built once from the SMALL side (`df.stat.bloomFilter`),
  * shipped to executors as a BINARY LITERAL child (so the expression works
  * through the ordinary function registry), deserialized once per plan
  * (lazy), and probed per-row in generated code — one hash + bit-test, no
  * UDF boxing (the filter object lands in the codegen references array).
  *
  * Guarantee used by callers: NO false negatives — a bloom prefilter
  * followed by an exact verify returns exactly the unfiltered result.
  */
case class BloomMightContainLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable => TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bloom_might_contain expects a FOLDABLE serialized bloom filter"
        )
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_might_contain expects (bigint, binary), got $other"
        )
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(right.eval().asInstanceOf[Array[Byte]])
    )

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(v: Any, ignored: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): BloomMightContainLong = copy(left = newLeft, right = newRight)
}

object BloomMightContainLong {
  /** Column form: `mightContain(bloom, col)` via the function registry
    * (the bloom travels as a binary literal). */
  def apply(bloom: BloomFilter, c: Column): Column = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    call_function("graft_bloom_might_contain", c, lit(bos.toByteArray))
  }
}
