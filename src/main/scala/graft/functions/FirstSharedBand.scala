package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Index of the FIRST position at which two `array<bigint>` band-hash
  * arrays agree (0-based), or -1 when they agree nowhere.
  *
  * The LSH pair-dedup trick (r6): a near-dup pair lands in the banded
  * self-join once per SHARED band — up to `bands` copies. Instead of a
  * corpus-scale `groupBy(id_a, id_b)` aggregate to collapse them (the
  * round-5 shape — measured as the dominant scale-point cost at 270M
  * candidate rows), each join row checks `first_shared_band(bhs_a,
  * bhs_b) == band` inside the join stage: exactly one row per pair
  * survives, no aggregate, no extra exchange. One fused codegen pass —
  * the `zip_with`/`array_position` HOF rendering would evaluate
  * interpreted lambdas per element on every candidate row.
  *
  * Null/length semantics: null array → null (nullIntolerant); a null
  * ELEMENT never matches (SQL equality with null is not true); arrays
  * compare up to the shorter length — band arrays are fixed-width by
  * construction ([[graft.ops.Dedup.bandHashes]]).
  */
case class FirstSharedBand(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"first_shared_band requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "first_shared_band"

  /** Public so generated code can call it. */
  def firstShared(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        return i
      i += 1
    }
    -1
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    firstShared(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("fsb", this, classOf[FirstSharedBand].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $refTerm.firstShared($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstSharedBand =
    copy(left = newLeft, right = newRight)
}
