package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass vector math over `array<double>` columns — the codegen
  * replacements for the interpreted-HOF renderings in
  * [[graft.ops.Similarity]] (`aggregate`/`zip_with`/`transform` lambdas
  * evaluate interpreted per ELEMENT: for a 1024-dim embedding that is
  * thousands of interpreted calls per row in every ANN rerank and
  * near-dup verify — the same ~50× pathology measured and fixed for
  * SimHash in round 1).
  *
  * Bit-exactness contract with the HOF renderings (differential-tested):
  * sequential left-to-right accumulation, IEEE double division (NaN/Inf
  * preserved), null result when lengths differ or any element is null —
  * exactly what `zip_with`'s null-padding produces in the HOF form.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType, true) ||
        left.dataType == ArrayType(DoubleType, false)) {
      if (right.dataType.isInstanceOf[ArrayType] &&
          right.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<double> inputs, got ${right.dataType.catalogString}")
    } else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<double> inputs, got ${left.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  /** Public so generated code can call it; boxed Double so a
    * length-mismatch/null-element row yields SQL NULL like the HOF. */
  def cosine(aRaw: ArrayData, bRaw: ArrayData): java.lang.Double = {
    val n = aRaw.numElements()
    if (bRaw.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (aRaw.isNullAt(i) || bRaw.isNullAt(i)) return null
      val x = aRaw.getDouble(i)
      val y = bRaw.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // zero-norm guard, same convention as JaccardSim's J(∅,∅) := 0.0:
    // 0/0 would be NaN, and NaN compares GREATER than every threshold
    // in Spark orderings — a zero embedding would rank top of every
    // top-k and pair with every doc in the near-dup filters
    if (na == 0.0 || nb == 0.0) return java.lang.Double.valueOf(0.0)
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("cs", this, classOf[CosineSim].getName)
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double $boxed = $refTerm.cosine($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id in one pass: bit i of the result is
  * set iff `planes(i) · vec >= 0`. Replaces `signBits` separate
  * interpreted `aggregate(zip_with(...))` passes per row
  * (Similarity.lshBucket HOF rendering, kept as the differential
  * oracle). A vector whose length differs from the plane dimension (or
  * containing a null) contributes a 0 bit for that plane — matching the
  * HOF's `when(null >= 0, bit).otherwise(0)`. */
case class LshBucket64(child: Expression, planes: Seq[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.size <= 64, "1..64 hyperplanes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket64 requires array<double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket64"

  @transient private lazy val planeArr: Array[Array[Double]] = planes.toArray

  /** Public so generated code can call it. */
  def bucket(vec: ArrayData): Long = {
    val n = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < planeArr.length) {
      val plane = planeArr(p)
      // dim mismatch → bit stays 0 (bucket 0), matching the HOF's null
      // dot — pinned by SimilaritySpec; the OPERATORS guard the silent
      // all-rows-in-bucket-0 degrade with a dim probe (Dedup.
      // nearDupEmbedding), since an expression can't fail per-row
      // without diverging from its SQL differential rendering
      if (plane.length == n) {
        var dot = 0.0
        var ok = true
        var i = 0
        while (ok && i < n) {
          if (vec.isNullAt(i)) ok = false
          else { dot += vec.getDouble(i) * plane(i); i += 1 }
        }
        if (ok && dot >= 0) sig |= 1L << p
      }
      p += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    bucket(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("lb", this, classOf[LshBucket64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refTerm.bucket($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket64 =
    copy(child = newChild)
}
