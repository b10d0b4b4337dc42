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

  test("preferencePairs: chosen=longest, rejected=shortest, singles dropped") {
    val t = Seq(
      // prompt "how?" gets three responses of different lengths
      ("c1", 0, "user", "how?"), ("c1", 1, "assistant", "medium reply"),
      ("c2", 0, "user", "how?"), ("c2", 1, "assistant", "the longest reply here"),
      ("c3", 0, "user", "how?"), ("c3", 1, "assistant", "short"),
      // prompt "hi" has ONE response → no pair
      ("c4", 0, "user", "hi"), ("c4", 1, "assistant", "hello"),
      // assistant NOT preceded by user → not a candidate
      ("c5", 0, "system", "how?"), ("c5", 1, "assistant", "ghost")
    ).toDF("conv_id", "turn_idx", "role", "text").repartition(3)
    val out = SftRender.preferencePairs(t).collect()
    assert(out.toSeq === Seq(
      Row("how?", "the longest reply here", "short", 3L)))
  }

  test("preferencePairs: length ties break on text, then conv, then idx") {
    val t = Seq(
      ("a1", 0, "user", "p"), ("a1", 1, "assistant", "bbb"),
      ("a2", 0, "user", "p"), ("a2", 1, "assistant", "aaa"),
      ("a3", 0, "user", "p"), ("a3", 1, "assistant", "aaa")
    ).toDF("conv_id", "turn_idx", "role", "text")
    // equal lengths: chosen = smallest text "aaa"; rejected = order-max
    // = largest (text, conv, idx) = "bbb"
    val out = SftRender.preferencePairs(t).collect()
    assert(out.toSeq === Seq(Row("p", "aaa", "bbb", 2L)))
  }

  test("preferencePairs: hashed ≡ string grouping") {
    val t = corpus.union(Seq(
      ("c9", 0, "user", "hello"), ("c9", 1, "assistant", "again"),
      ("c8", 0, "user", "hello"), ("c8", 1, "assistant", "other")
    ).toDF("conv_id", "turn_idx", "role", "text"))
    val h = SftRender.preferencePairs(t, hashed = true)
    val s = SftRender.preferencePairs(t, hashed = false)
    assert(h.exceptAll(s).count() === 0 && s.exceptAll(h).count() === 0)
    assert(h.count() > 0)
  }

  test("contextLengthHist: log2 buckets with min/max") {
    // c1 render len 80 (13+1+18+1+47) → bucket 7 (64..127);
    // c2 len 44 (10+1+15+1+17) → bucket 6 (32..63)
    val out = SftRender.contextLengthHist(corpus).orderBy("len_bucket").collect()
    assert(out.toSeq === Seq(Row(6, 1L, 44L, 44L), Row(7, 1L, 80L, 80L)))
  }

  test("supervisionDensity: hand-computed token shares") {
    // c1: assistant turn has 4 tokens ("CALL tool=search args={}
    // dur_ms=12" splits into 4), user 1, system 2 → 4/7 = 5714 e4
    // c2: assistant "ok"+"done" = 2 tokens, user "hi" 1 → 2/3 = 6666 e4
    val out = SftRender.supervisionDensity(corpus)
      .orderBy("conv_id").collect()
    assert(out(0) === Row("c1", 3L, 4L, 7L, 5714L))
    assert(out(1) === Row("c2", 3L, 2L, 3L, 6666L))
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

  test("roleAlternationAudit: repeats, opener legality, valid flag") {
    val t = Seq(
      // v1: user → assistant → user — clean
      ("v1", 0, "user", "a"), ("v1", 1, "assistant", "b"), ("v1", 2, "user", "c"),
      // v2: system opener, one adjacent assistant repeat
      ("v2", 0, "system", "s"), ("v2", 1, "assistant", "x"),
      ("v2", 2, "assistant", "y"),
      // v3: opens with assistant — illegal opener, no repeats
      ("v3", 0, "assistant", "x"), ("v3", 1, "user", "u")
    ).toDF("conv_id", "turn_idx", "role", "text").repartition(3)
    val out = SftRender.roleAlternationAudit(t).orderBy("conv_id").collect()
    assert(out(0) === Row("v1", 3L, 0L, "user", 1))
    assert(out(1) === Row("v2", 3L, 1L, "system", 0))
    assert(out(2) === Row("v3", 2L, 0L, "assistant", 0))
  }

  test("contextTruncate: greedy suffix within token budget") {
    // tokens per turn: t0=3, t1=2, t2=4, t3=1. Budget 5: suffix sums
    // from the end are t3=1, t2=5, t1=7 → keep t2,t3 (2 turns, 5 toks)
    val t = Seq(
      ("k1", 0, "user", "a b c"), ("k1", 1, "assistant", "d e"),
      ("k1", 2, "user", "f g h i"), ("k1", 3, "assistant", "j"),
      // k2 fits whole: 1+1=2 ≤ 5 → untruncated
      ("k2", 0, "user", "x"), ("k2", 1, "assistant", "y")
    ).toDF("conv_id", "turn_idx", "role", "text").repartition(2)
    val out = SftRender.contextTruncate(t, maxTokens = 5L)
      .orderBy("conv_id").collect()
    assert(out(0) === Row("k1", 4L, 10L, 2L, 5L, 1))
    assert(out(1) === Row("k2", 2L, 2L, 2L, 2L, 0))
  }

  test("prefixDedupGroups: digit-normalized k-turn prefixes, survivor = min conv") {
    val t = Seq(
      // g1 and g2 share the same seed prompt after digit normalization
      ("g2", 0, "user", "run job 17"), ("g2", 1, "assistant", "ok id=17"),
      ("g1", 0, "user", "run job 3"), ("g1", 1, "assistant", "ok id=3"),
      ("g1", 2, "user", "diverges here"),
      // g3: different prefix → singleton, dropped
      ("g3", 0, "user", "hello"), ("g3", 1, "assistant", "hi")
    ).toDF("conv_id", "turn_idx", "role", "text").repartition(3)
    val out = SftRender.prefixDedupGroups(t, k = 2).collect()
    assert(out.toSeq === Seq(
      Row("<|user|>run job 0\n<|assistant|>ok id=0", 2L, "g1")))
    // hashed ≡ string grouping
    val s = SftRender.prefixDedupGroups(t, k = 2, hashed = false)
    assert(out.toSeq === s.collect().toSeq)
  }

  test("contextTruncate: a single over-budget final turn keeps nothing") {
    val t = Seq(("z1", 0, "user", "one two three four five six"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftRender.contextTruncate(t, maxTokens = 3L).collect()
    assert(out.toSeq === Seq(Row("z1", 1L, 6L, 0L, 0L, 1)))
  }
}
