package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.synth.TranscriptSynth

/** Recombine-analog invariants (FIXTURES.md §5):
  * order-invariance under shuffled arrival, salted ≡ unsalted,
  * per-turn text byte-equality through the rollup round-trip. */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def mkTurns(rows: Seq[(String, Int, String)]) =
    rows.map { case (c, i, t) =>
      (c, i, "user", t, "", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("rollup concatenates in turn_idx order regardless of input order") {
    val ordered = Seq(("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "c"))
    val shuffled = Seq(("c1", 2, "c"), ("c1", 0, "a"), ("c1", 1, "b"))
    val a = Rollup.rollup(mkTurns(ordered)).select("full_text").as[String].head()
    val b = Rollup.rollup(mkTurns(shuffled).repartition(3)).select("full_text").as[String].head()
    assert(a == "a\nb\nc" && b == "a\nb\nc")
  }

  test("salted rollup ≡ plain rollup on a skewed corpus (hot conversation)") {
    val turns = TranscriptSynth.generate(spark,
      TranscriptSynth.Config(nTurns = 5000, nConvs = 10, hotPct = 60)).cache()
    // hot conv exists: conv 0 should hold ~60% of turns
    val hot = turns.filter(col("conv_id") === "conv-00000000").count()
    assert(hot > 2500, s"skew profile broken: hot conv has $hot of 5000")
    val plain = Rollup.rollup(turns).orderBy("conv_id")
      .select("conv_id", "n_turns", "full_text").as[(String, Long, String)].collect()
    val salted = Rollup.rollupSalted(turns, blockSize = 64).orderBy("conv_id")
      .select("conv_id", "n_turns", "full_text").as[(String, Long, String)].collect()
    assert(plain.toSeq == salted.toSeq)
  }

  test("property: salted ≡ plain for arbitrary small transcripts (10 seeded cases)") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val pairs = Seq.fill(1 + rnd.nextInt(50))(
        (s"c${rnd.nextInt(4)}", rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString))
      // dense unique turn_idx per conv
      val rows = pairs.groupBy(_._1).toSeq.flatMap { case (c, ps) =>
        ps.zipWithIndex.map { case ((_, txt), i) => (c, i, txt) }
      }
      val df = mkTurns(rows).repartition(4)
      val a = Rollup.rollup(df).select("conv_id", "full_text")
        .as[(String, String)].collect().toMap
      val b = Rollup.rollupSalted(df, 4).select("conv_id", "full_text")
        .as[(String, String)].collect().toMap
      assert(a == b, s"seed $seed diverged")
    }
  }

  test("per-turn text round-trips byte-identical (north-rule invariant)") {
    val texts = Seq("héllo wörld", "tab\tchar", "emoji 😀", "trailing  spaces  ")
    val turns = mkTurns(texts.zipWithIndex.map { case (t, i) => ("c1", i, t) })
    val back = Rollup.rollup(turns).select("full_text").as[String].head().split("\n", -1)
    assert(back.toSeq == texts)
  }
}
