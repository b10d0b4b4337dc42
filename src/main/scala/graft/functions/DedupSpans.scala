package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Within-document repeated-span REMOVAL — the rewrite step of
  * substring dedup (Lee et al. 2022, arXiv:2107.06499), scoped to
  * within-doc repeats: every token n-gram window whose text already
  * occurred at an earlier position in the SAME document marks its token
  * range [pos, pos+n-1] as covered, covered ranges union, and the
  * output is the kept tokens re-joined by single spaces (tokens are the
  * spans between single 0x20 bytes, so the join is byte-lossless for
  * the kept content — cross-doc dup handling is the detection +
  * doc-level-drop path: duplicatedSpans / dedupGroups / Curation).
  *
  * Repeat detection compares the actual window SUBSTRINGS (a per-row
  * set of UTF8String slices, not hashes), so the semantics are exactly
  * reproducible by a SQL oracle with no collision caveat. One byte-level
  * pass per row, no shuffle — a pure narrow map at any corpus size.
  * Docs shorter than n tokens have one degenerate window, never a
  * repeat: they pass through byte-identical.
  */
case class DedupSpans(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "span window size must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dedup_spans requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dedup_spans"

  /** Public so generated code can call it. */
  def removeSpans(s: UTF8String): UTF8String = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    // count-only early-out: short docs (the common case corpus-wide)
    // skip the boundary pass and its two array allocations
    val tc = TokenBounds.count(base, off, nb)
    if (tc < n) return s.clone()
    val (starts, ends, tokCount) = TokenBounds.scan(base, off, nb, tc)
    val windows = tokCount - n + 1
    val covered = new Array[Boolean](tokCount)
    // presize hint clamped like ShingleArray's (overflow-safe for
    // pathological token-dense giants); the set still grows to any size
    val seen = new java.util.HashSet[UTF8String](
      math.min(windows.toLong * 2, 1L << 20).toInt)
    var w = 0
    var anyCovered = false
    while (w < windows) {
      // the window is the contiguous byte slice from token w's start to
      // token w+n-1's end (see ShingleArray's equivalence argument)
      val slice = UTF8String.fromAddress(base, off + starts(w),
        ends(w + n - 1) - starts(w))
      if (!seen.add(slice)) {
        var k = w
        while (k < w + n) { covered(k) = true; k += 1 }
        anyCovered = true
      }
      w += 1
    }
    if (!anyCovered) return s.clone()
    // rebuild: kept tokens joined by single spaces (exact, since source
    // tokens are separated by exactly one 0x20 each); bulk range copies
    // into a right-sized buffer — output can only shrink
    val outBytes = new Array[Byte](nb)
    var outLen = 0
    var first = true
    var t = 0
    while (t < tokCount) {
      if (!covered(t)) {
        if (!first) { outBytes(outLen) = 0x20; outLen += 1 }
        val len = ends(t) - starts(t)
        Platform.copyMemory(base, off + starts(t), outBytes,
          Platform.BYTE_ARRAY_OFFSET + outLen, len)
        outLen += len
        first = false
      }
      t += 1
    }
    UTF8String.fromBytes(outBytes, 0, outLen)
  }

  override def nullSafeEval(input: Any): Any =
    removeSpans(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("dds", this, classOf[DedupSpans].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refTerm.removeSpans($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DedupSpans =
    copy(child = newChild)
}
