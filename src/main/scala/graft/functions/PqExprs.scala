package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared input contract for the PQ expressions: an `array<double>`
  * vector column (the ops layer casts the stored `array<float>` once).
  * Arithmetic is the SAME IEEE sequence as the unrolled declarative
  * rendering in [[graft.ops.Similarity]] — per subspace `j` a
  * LEFT-ASSOCIATIVE double sum of `(v−c)²` terms, then
  * `Math.floor(1e6·sum)` to a long — so results are bit-identical to
  * the `element_at`/`least(struct…)` plans these expressions replace
  * (and to the SQL oracles, which render that unrolled arithmetic).
  *
  * Why they exist: at 16 centroids × 8 subspaces × 8 dims the unrolled
  * plan is ~2–3k expression nodes per use — janino compile time (and
  * the constant-fold pass over the tree) dominates the query on any
  * input size. A loop over `addReferenceObj` state is the
  * [[SimHash64]] fix applied to PQ.
  */
private[graft] object PqArith {
  /** floor(1e6 · Σ_i (v[off+i] − c(cOff+i))²) over `len` terms, summed
    * left-to-right. `cOff` lets a full-dim centroid be read per
    * subspace without slicing (allocation-free). */
  def subDistE6(v: ArrayData, off: Int, c: Array[Double], cOff: Int,
                len: Int): Long = {
    var acc = 0.0
    var i = 0
    while (i < len) {
      val d = v.getDouble(off + i) - c(cOff + i)
      acc += d * d
      i += 1
    }
    math.floor(1e6 * acc).toLong
  }

  /** Fail LOUD on a short vector: `UnsafeArrayData.getDouble` does no
    * bounds check, so an undersized row would otherwise compute a
    * distance from whatever bytes follow the array — silently wrong
    * and non-deterministic. Same contract as Similarity.requireDim. */
  def requireLen(v: ArrayData, want: Int, op: String): Unit =
    if (v.numElements() < want)
      throw new IllegalArgumentException(
        s"$op: vector has ${v.numElements()} elements, needs $want")
}

/** PQ asymmetric-distance: encode the vector against `codebook`
  * (per subspace the argmin-distance centroid, ties → smaller code —
  * `least(struct(d, c))` order) and sum the query's precomputed
  * integer distance table at those codes. Replaces the
  * pqEncode + `element_at(lit(dtab), code+1)` rendering one-for-one.
  *
  * `codebook(j)(c)` = centroid `c`'s subspace-`j` slice;
  * `dtab(j)(c)` = floor(1e6·L2²(query_j, codebook(j)(c))).
  */
case class PqAdtE6(child: Expression,
                   codebook: Array[Array[Array[Double]]],
                   dtab: Array[Array[Long]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adt_e6 requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adt_e6"

  private val sub = codebook(0)(0).length

  /** Public so generated code can call it. */
  def adt(v: ArrayData): Long = {
    PqArith.requireLen(v, codebook.length * sub, prettyName)
    var total = 0L
    var j = 0
    while (j < codebook.length) {
      val cents = codebook(j)
      var bestD = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < cents.length) {
        val d = PqArith.subDistE6(v, j * sub, cents(c), 0, sub)
        if (d < bestD) { bestD = d; bestC = c } // strict < : ties keep
        c += 1                                  // the smaller code
      }
      total += dtab(j)(bestC)
      j += 1
    }
    total
  }

  override def nullSafeEval(input: Any): Any = adt(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("pqadt", this, classOf[PqAdtE6].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refTerm.adt($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdtE6 =
    copy(child = newChild)
}

/** IVF coarse-cell assignment under the PQ quantization contract:
  * the cell is the argmin over `centroids` of Σ_j floor(1e6·L2²_j)
  * (per-subspace floors summed as longs — exactly `fullDistE6`'s
  * `reduceLeft(_ + _)` over bigint columns), ties → smaller cell id
  * (`least(struct(d, cell))` order). `m` slices each full-dim centroid
  * into the same subspaces the PQ side uses. */
case class PqCellAssignE6(child: Expression,
                          centroids: Array[Array[Double]],
                          m: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_cell_assign_e6 requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_cell_assign_e6"

  require(centroids.nonEmpty, "pq_cell_assign_e6: empty codebook")
  // truncating division would silently IGNORE trailing dimensions in
  // every distance when dim is not a multiple of m — two vectors
  // differing only past dim m*sub would assign identically with no
  // error; the misconfiguration must fail at construction
  require(centroids(0).length % m == 0,
    s"pq_cell_assign_e6: centroid dim ${centroids(0).length} not divisible by m=$m")

  private val sub = centroids(0).length / m

  /** Public so generated code can call it. */
  def assign(v: ArrayData): Int = {
    PqArith.requireLen(v, m * sub, prettyName)
    var bestD = Long.MaxValue
    var bestCell = 0
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0L
      var j = 0
      while (j < m) {
        d += PqArith.subDistE6(v, j * sub, cent, j * sub, sub)
        j += 1
      }
      if (d < bestD) { bestD = d; bestCell = c } // strict < : smaller id
      c += 1
    }
    bestCell
  }

  override def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm =
      ctx.addReferenceObj("pqcell", this, classOf[PqCellAssignE6].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refTerm.assign($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqCellAssignE6 = copy(child = newChild)
}

/** Scalar-quantization (SQ8) asymmetric L2²: each dimension of the
  * `array<double>` input quantizes to an int code
  * `clamp₀₋₂₅₅(floor((v − mn) · 255 / (mx − mn)))` (a constant dim,
  * `mx == mn`, codes to 0), and the result is the EXACT integer
  * Σ (qcode − code)² against the query's precomputed codes — FAISS's
  * SQ8 index arithmetic with the same all-integer-after-the-quantizer
  * property as the PQ pair above, so a SQL oracle that recomputes
  * mn/mx from the data replays the ranking bitwise (min/max are exact
  * selections; the per-dim float expression is a fixed IEEE sequence;
  * the distance sum is integer, order-free).
  *
  * Same loop-over-`addReferenceObj` shape as [[PqAdtE6]]: unrolled,
  * 64 dims × ~12 nodes would put janino compile back on the hot path.
  */
case class SqL2Dist(child: Expression,
                    mn: Array[Double], mx: Array[Double],
                    qcodes: Array[Long]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sq_l2_dist requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_l2_dist"

  /** Public so generated code can call it. */
  def dist(v: ArrayData): Long = {
    PqArith.requireLen(v, mn.length, prettyName)
    var acc = 0L
    var i = 0
    while (i < mn.length) {
      val code =
        if (mx(i) == mn(i)) 0L
        else {
          val f = math.floor(
            (v.getDouble(i) - mn(i)) * 255.0 / (mx(i) - mn(i))).toLong
          math.max(0L, math.min(255L, f))
        }
      val d = qcodes(i) - code
      acc += d * d
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = dist(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("sq", this, classOf[SqL2Dist].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refTerm.dist($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SqL2Dist =
    copy(child = newChild)
}
