package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkOverlap: hand-computed chunks, overlap, and short tail") {
    val docs = Seq((1L, "a" * 157), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val out = Chunking.chunkOverlap(docs, "doc_id", "text",
      chunkLen = 80, stride = 60)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1: len 157 → starts 0, 60, 120 (idx (157-1) div 60 = 2)
    assert(out.count(_.getLong(0) == 1L) === 3)
    assert(out(0) === Row(1L, 0L, 0L, "a" * 80))
    assert(out(1) === Row(1L, 1L, 60L, "a" * 80))
    assert(out(2) === Row(1L, 2L, 120L, "a" * 37)) // tail: 157-120
    // doc 2: shorter than one chunk → single chunk, full text
    assert(out(3) === Row(2L, 0L, 0L, "xy"))
    // empty doc still emits its chunk 0 (empty) — renderer loses no docs
    assert(out(4) === Row(3L, 0L, 0L, ""))
  }

  test("chunkOverlap: every chunk equals substring(text, start, chunkLen)") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog " * 7))
      .toDF("doc_id", "text")
    val bad = Chunking.chunkOverlap(docs, "doc_id", "text", 80, 60)
      .join(docs, "doc_id")
      .filter($"chunk_text" =!=
        expr("substring(text, cast(start_off + 1 as int), 80)"))
    assert(bad.count() === 0)
    // consecutive starts differ by exactly the stride
    val starts = Chunking.chunkOverlap(docs, "doc_id", "text", 80, 60)
      .orderBy("chunk_idx").select("start_off").as[Long].collect()
    assert(starts.zip(starts.drop(1)).forall { case (a, b) => b - a == 60 })
  }

  test("fimRender: offsets + reassembly recovers the original text") {
    val docs = Seq((1L, "0123456789"), (2L, "ab"), (3L, ""), (4L, "x" * 31))
      .toDF("doc_id", "text")
    val out = Chunking.fimRender(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // n=10: a=3, b=6 → PRE=012, SUF=6789, MID=345
    assert(out(0) === Row(1L, 3L, 6L, "<PRE>012<SUF>6789<MID>345"))
    // n=2: a=0, b=1 → PRE empty, SUF=b, MID=a
    assert(out(1) === Row(2L, 0L, 1L, "<PRE><SUF>b<MID>a"))
    // empty doc: all parts empty
    assert(out(2) === Row(3L, 0L, 0L, "<PRE><SUF><MID>"))
    // reassembly property on every row: prefix+middle+suffix == text
    val bad = Chunking.fimRender(docs, "doc_id", "text")
      .join(docs, "doc_id")
      .withColumn("rebuilt", concat(
        expr("substring(text, 1, cast(mid_start as int))"),
        expr("substring(text, cast(mid_start + 1 as int), cast(mid_end - mid_start as int))"),
        expr("substring(text, cast(mid_end + 1 as int), length(text))")))
      .filter($"rebuilt" =!= $"text")
    assert(bad.count() === 0)
  }
}
