package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SftRenderSpec extends SparkSpec {
  import spark.implicits._

  // deliberately OUT of turn order, so any collect_list-order
  // dependence (instead of the array_sort) fails the exact-string cases
  private def corpus = Seq(
    ("c1", 2, "assistant", "CALL tool=search args={} dur_ms=12"),
    ("c1", 0, "user", "hello"),
    ("c1", 1, "system", "be brief"),
    ("c2", 1, "assistant", "ok"),
    ("c2", 0, "user", "hi"),
    ("c2", 2, "assistant", "done")
  ).toDF("conv_id", "turn_idx", "role", "text").repartition(4)

  test("renderChat renders turns in turn_idx order with role sigils") {
    val out = SftRender.renderChat(corpus).orderBy("conv_id").collect()
    assert(out(0) === Row("c1",
      "<|user|>hello\n<|system|>be brief\n<|assistant|>CALL tool=search args={} dur_ms=12", 3))
    assert(out(1) === Row("c2", "<|user|>hi\n<|assistant|>ok\n<|assistant|>done", 3))
  }

  test("lossMaskSpans: hand-computed offsets") {
    // c2 rendering: "<|user|>hi" (10) + "\n" + "<|assistant|>ok" (15)
    //   + "\n" + "<|assistant|>done" (17)
    val out = SftRender.lossMaskSpans(corpus)
      .filter($"conv_id" === "c2").orderBy("turn_idx").collect()
    assert(out.toSeq === Seq(Row("c2", 1, 11L, 26L), Row("c2", 2, 27L, 44L)))
  }

  test("render ↔ spans round-trip: substring at every span equals the turn rendering") {
    // the pair's defining property, on every assistant turn: the span
    // cut out of the rendered conversation IS that turn's rendering
    val rendered = SftRender.renderChat(corpus)
    val spans = SftRender.lossMaskSpans(corpus)
    val bad = spans.join(rendered, "conv_id")
      .join(corpus.filter($"role" === "assistant"), Seq("conv_id", "turn_idx"))
      .withColumn("cut", expr("substring(rendered, cast(start_off + 1 as int), cast(end_off - start_off as int))"))
      .withColumn("want", concat(lit("<|assistant|>"), $"text"))
      .filter($"cut" =!= $"want")
    assert(bad.count() === 0)
    assert(spans.count() === 3)
  }

  test("non-assistant mask role and empty text") {
    val tiny = Seq(("c3", 0, "user", ""), ("c3", 1, "tool", "x"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftRender.lossMaskSpans(tiny, maskRole = "tool").collect()
    // "<|user|>" len 8, +1 sep → tool turn starts at 9, len 4+4+1=9
    assert(out.toSeq === Seq(Row("c3", 1, 9L, 18L)))
    val r = SftRender.renderChat(tiny).collect()
    assert(r.head.getString(1) === "<|user|>\n<|tool|>x")
  }
}
