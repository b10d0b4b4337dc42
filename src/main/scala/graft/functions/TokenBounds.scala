package graft.functions

import org.apache.spark.unsafe.Platform

/** Shared byte-level token-boundary scanner: tokens are the spans
  * between single 0x20 bytes (regex " " with limit -1 semantics —
  * empties kept; a UTF-8 continuation byte can never be 0x20). Both
  * [[ShingleArray]] and [[DedupSpans]] derive their windows from this
  * scan, which is what makes their window-slice equivalence arguments
  * (and the d14/d17 oracle parity that rests on them) a single fact
  * rather than two copies to keep in sync.
  */
private[functions] object TokenBounds {

  /** Token count alone (the scan's first pass) — lets callers with a
    * minimum-token threshold early-out before paying the boundary pass
    * and its two array allocations (DedupSpans does, per short doc on
    * the full-corpus d17 path). */
  def count(base: AnyRef, off: Long, nb: Int): Int = {
    var tokCount = 1
    var i = 0
    while (i < nb) {
      if (Platform.getByte(base, off + i) == 0x20) tokCount += 1
      i += 1
    }
    tokCount
  }

  /** Returns (starts, ends, tokenCount) as byte offsets into the
    * string: token t spans [starts(t), ends(t)). Pass a
    * `precomputedCount` from [[count]] to skip the counting pass. */
  def scan(base: AnyRef, off: Long, nb: Int,
           precomputedCount: Int = -1): (Array[Int], Array[Int], Int) = {
    val tokCount =
      if (precomputedCount >= 0) precomputedCount else count(base, off, nb)
    val starts = new Array[Int](tokCount)
    val ends = new Array[Int](tokCount)
    var t = 0
    starts(0) = 0
    var i = 0
    while (i < nb) {
      if (Platform.getByte(base, off + i) == 0x20) {
        ends(t) = i; t += 1; starts(t) = i + 1
      }
      i += 1
    }
    ends(t) = nb
    (starts, ends, tokCount)
  }
}
