package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Banded LSH keys over a minhash signature in ONE pass: element b of
  * the result is `xxhash64(slice(sig, b·r+1, r), b)` — the XXH64 fold
  * Spark's hash expression applies (seed 42, null elements skipped,
  * then the band index chained as an int), bit-identical to the
  * `transform(sequence(0, bands-1), b -> xxhash64(slice(sig, …), b))`
  * HOF rendering this replaces (r6). The HOF evaluated `bands`
  * interpreted lambdas per document, each allocating a slice copy of
  * the signature — on the LSH corpus passes (d07/d26/d32/p67 and the
  * bench scale point) that was `bands` interpreted evals × an array
  * allocation for every document in the corpus.
  *
  * Null input signature → null (nullIntolerant; the HOF produced
  * seed-only junk buckets for null-signature rows, which paired
  * null-text docs into degenerate candidates that the downstream
  * null-Jaccard filter then discarded — pruning them at the source
  * changes no results, only removes the wasted candidates).
  */
case class BandHashes(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(bands > 0 && numHashes % bands == 0,
    s"bands=$bands must divide numHashes=$numHashes")

  private val r = numHashes / bands

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_hashes requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "band_hashes"

  /** Public so generated code can call it. */
  def hashes(sig: ArrayData): ArrayData = {
    val n = sig.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var i = b * r
      val end = math.min(i + r, n)
      while (i < end) {
        if (!sig.isNullAt(i)) h = XXH64.hashLong(sig.getLong(i), h)
        i += 1
      }
      out(b) = XXH64.hashInt(b, h)
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("bh", this, classOf[BandHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refTerm.hashes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}
