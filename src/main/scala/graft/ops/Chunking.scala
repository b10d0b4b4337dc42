package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-to-training-unit rendering: fixed-size overlapping chunks
  * (the RAG / retrieval-index prep step) and fill-in-middle rendering
  * (the code-model training transform). Both are pure per-row
  * projections — integer offset arithmetic plus substring — so the
  * plans are narrow codegen maps with ZERO shuffle: at 100 TB each
  * input split renders independently and the output partitioning is
  * inherited from the scan.
  *
  * All offsets are computed with integer division (`div`), never float
  * math, so a SQL oracle reproduces every boundary bitwise.
  */
object Chunking {

  /** Sliding-window chunking: one row per (doc, chunk) with the chunk's
    * 0-based char offset and text. Chunks start at 0, stride, 2·stride, …
    * while the start is inside the text; each chunk is `chunkLen` chars
    * (the last one shorter), so consecutive chunks overlap by
    * `chunkLen - stride` chars. Empty/whitespace-only docs still emit
    * their single (possibly empty) chunk 0 — droppable downstream, but
    * the renderer must not silently lose documents that HAVE text.
    * NULL-text docs are excluded (the suite-wide convention, matching
    * the d39 oracle's `WHERE text IS NOT NULL`); a pipeline that needs
    * them quarantined should route them before chunking, as
    * [[Curation.decide]] does with its explicit 'empty' verdict.
    *
    * Chunk count per doc = 1 + (max(len,1)-1) div stride — bounded by
    * doc length, so the explode fans out ~len/stride rows per input row
    * with no skew beyond the longest single document. */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
                   chunkLen: Int = 80, stride: Int = 60): DataFrame = {
    require(chunkLen > 0 && stride > 0 && stride <= chunkLen,
      s"need 0 < stride <= chunkLen, got chunkLen=$chunkLen stride=$stride")
    val lastIdx = call_function("div",
      (greatest(length(col(textCol)), lit(1)) - lit(1)).cast("bigint"),
      lit(stride.toLong)).cast("int")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol).as("_t"),
        explode(sequence(lit(0), lastIdx)).as("_i"))
      .select(col(idCol),
        col("_i").cast("bigint").as("chunk_idx"),
        (col("_i") * stride).cast("bigint").as("start_off"),
        col("_t").substr(col("_i") * stride + lit(1), lit(chunkLen))
          .as("chunk_text"))
  }

  /** Fill-in-middle rendering (PSM order): split each document at the
    * deterministic third-points a = n div 3, b = 2n div 3 and emit
    * `<PRE>prefix<SUF>suffix<MID>middle` plus the [a, b) middle-span
    * offsets — the trainer's target is everything after `<MID>`.
    * Production would randomize the split per epoch; a hash-seeded
    * offset drops in for the third-points without changing the plan
    * shape (still a narrow map). Reassembling prefix+middle+suffix from
    * the offsets recovers the original text exactly — asserted per-row
    * in ChunkingSpec. */
  def fimRender(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = length(col(textCol)).cast("bigint")
    val a = call_function("div", n, lit(3L))
    val b = call_function("div", n * lit(2L), lit(3L))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), a.as("mid_start"), b.as("mid_end"),
        concat(
          // Substring wants Int pos/len (no implicit Long narrowing)
          lit("<PRE>"), col(textCol).substr(lit(1), a.cast("int")),
          lit("<SUF>"), col(textCol).substr((b + lit(1L)).cast("int"),
            (n - b).cast("int")),
          lit("<MID>"), col(textCol).substr((a + lit(1L)).cast("int"),
            (b - a).cast("int"))
        ).as("fim_text"))
  }
}
