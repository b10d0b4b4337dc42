package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a shingle array in ONE pass: element h of the
  * result is `min over shingles s of xxhash64(s, h)`.
  *
  * Bit-identical to the HOF rendering
  * `transform(sequence(0, K-1), h -> array_min(transform(sh, s ->
  * xxhash64(s, h))))` — Spark's `xxhash64(s, h)` chains
  * `XXH64.hashUnsafeBytes(s, seed=42)` then `XXH64.hashInt(h, ·)`, so
  * the expensive string hash is h-independent. The HOF walks the shingle
  * array K times through interpreted lambdas AND re-hashes every string
  * K times; this expression hashes each string once and applies K cheap
  * integer avalanche steps — K× less string hashing on top of the
  * interpreted→codegen win (the SimHash fix measured that alone at ~50×).
  *
  * Empty shingle array → array of K nulls (array_min of empty is null),
  * matching the HOF; null input array → null (nullIntolerant).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string> or array<long>, got ${other.catalogString}")
  }

  @transient private lazy val isString: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  /** Public so generated code can call it. */
  def signature(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // xxhash64's per-child fold: null contributes nothing (seed passes
      // through), a string hashes its bytes — then the int h is chained
      val base =
        if (sh.isNullAt(i)) 42L
        else if (isString) {
          val s = sh.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        } else XXH64.hashLong(sh.getLong(i), 42L)
      var h = 0
      while (h < numHashes) {
        val v = XXH64.hashInt(h, base)
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("mhs", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refTerm.signature($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Jaccard similarity of two arrays in ONE pass — replaces the double
  * `array_intersect` evaluation in the HOF rendering
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect(a,b)))`
  * (each array_intersect builds its hash map per row, and the HOF form
  * built it twice). Works over string OR long element types (long = the
  * hashed-shingle shuffle-slimming path). Sizes are RAW array sizes and
  * the intersection is distinct-count, exactly like array_intersect. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // the rule is exactly: both arrays, same SUPPORTED element type
  // (containsNull ignored) — spelled once, not as two overlapping
  // disjuncts
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if (l == StringType || l == LongType) && l == r =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim requires two array<string> or two array<long> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  @transient private lazy val isString: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType

  private def elem(arr: ArrayData, i: Int): AnyRef =
    if (arr.isNullAt(i)) null
    else if (isString) arr.getUTF8String(i)
    else java.lang.Long.valueOf(arr.getLong(i))

  /** Public so generated code can call it. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    // J(∅,∅) := 0.0 (no similarity evidence), not 0/0: NaN compares
    // GREATER than any threshold in Spark orderings, which would pair
    // every empty doc with every other; and the HOF oracle's Divide
    // throws DIVIDE_BY_ZERO under ANSI. Both renderings guard this.
    if (na + nb == 0) return 0.0
    // sorted-merge fast path (r6): the LSH verify paths pre-sort their
    // hashed shingle arrays ONCE PER DOC (sort_array upstream), so the
    // per-PAIR intersection runs as an unboxed long merge instead of
    // building two boxed HashSets per candidate — at the 10× scale
    // point that is 17M pairs × ~300-element sets of avoided boxing.
    // Result is bit-identical (same distinct-intersection count, same
    // raw-size denominator, same IEEE division); the O(n) sortedness
    // probe is noise next to the hash-set build it replaces.
    if (!isString && isSortedNoNullLongs(a, na) && isSortedNoNullLongs(b, nb))
      return mergeJaccardSorted(a, na, b, nb)
    val setA = new java.util.HashSet[AnyRef](na * 2)
    var i = 0
    while (i < na) { setA.add(elem(a, i)); i += 1 }
    val matched = new java.util.HashSet[AnyRef](8)
    i = 0
    while (i < nb) {
      val e = elem(b, i)
      if (setA.contains(e)) matched.add(e)
      i += 1
    }
    val inter = matched.size.toDouble
    inter / (na + nb - inter)
  }

  private def isSortedNoNullLongs(x: ArrayData, n: Int): Boolean = {
    var i = 0
    var prev = Long.MinValue
    while (i < n) {
      if (x.isNullAt(i)) return false
      val v = x.getLong(i)
      if (v < prev) return false
      prev = v
      i += 1
    }
    true
  }

  /** Distinct-count merge intersection over sorted long arrays; duplicate
    * runs collapse so the count matches the hash-set rendering exactly. */
  private def mergeJaccardSorted(a: ArrayData, na: Int,
                                 b: ArrayData, nb: Int): Double = {
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va < vb) i += 1
      else if (vb < va) j += 1
      else {
        inter += 1
        while (i < na && a.getLong(i) == va) i += 1
        while (j < nb && b.getLong(j) == va) j += 1
      }
    }
    inter.toDouble / (na + nb - inter)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("js", this, classOf[JaccardSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $refTerm.jaccard($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}
