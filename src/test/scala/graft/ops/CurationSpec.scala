package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val cleanText =
    "the cat and the dog walk to the park in the morning and it is " +
      "a fine day for a walk outside with friends"
  private val benchText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  private lazy val docs = Seq(
    (1L, cleanText),                        // survivor of the 1/2 pair → keep
    (2L, cleanText),                        // exact dup of 1
    (3L, ("buy now " * 8).trim),            // 16 tokens of loop → repetitive
    (4L, benchText),                        // full benchmark overlap
    (5L, "12345 67890 abcde"),              // digit-heavy scrap → low quality
    (6L, cleanText.replace("cat", "bird")), // distinct clean prose → keep
    (7L, benchText)                         // dup AND contaminated: dup wins
  ).toDF("doc_id", "text")
  private lazy val bench = Seq(Tuple1(benchText)).toDF("text")

  test("curation decision: first failing check wins, severity-ordered") {
    val got = Curation.decide(docs, "doc_id", "text", bench, "text")
      .as[(Long, String, Boolean)].collect().toSet
    val want = Set(
      (1L, "keep", true),
      (2L, "exact_dup", false),
      (3L, "repetitive", false),
      (4L, "contaminated", false),
      // 3 tokens: below the ≥10-token repetition-evidence guard (its
      // 2 distinct bigrams put the top share at 5000 by pigeonhole —
      // without the guard this doc would be mis-dropped as repetitive)
      (5L, "low_quality", false),
      (6L, "keep", true),
      // same text as the contaminated doc 4 but higher id — the dup
      // check outranks contamination so drop tallies partition cleanly
      (7L, "exact_dup", false))
    assert(got == want, s"got $got")
  }

  test("curation decision: null-text docs get 'empty' on both paths") {
    // without the explicit branch the two renderings disagree: xxhash64
    // skips null children (both nulls share the seed → one 'keeps'),
    // while the string equi-join silently drops null keys entirely
    val withNulls = docs.unionByName(
      Seq((8L, None: Option[String]), (9L, None: Option[String]))
        .toDF("doc_id", "text"))
    def run(h: Boolean) =
      Curation.decide(withNulls, "doc_id", "text", bench, "text", hashed = h)
        .as[(Long, String, Boolean)].collect().toSet
    val hashed = run(true)
    assert(hashed == run(false))
    assert(hashed.filter(_._1 >= 8L) ==
      Set((8L, "empty", false), (9L, "empty", false)))
    assert(hashed.size == 9) // the 7 non-null verdicts are untouched
  }

  test("curation decision: hashed production path ≡ string oracle path") {
    val str = Curation.decide(docs, "doc_id", "text", bench, "text",
        hashed = false)
      .as[(Long, String, Boolean)].collect().toSet
    val hashed = Curation.decide(docs, "doc_id", "text", bench, "text")
      .as[(Long, String, Boolean)].collect().toSet
    assert(hashed == str && hashed.size == 7)
  }

  test("mixing sample: deterministic per-source rates, default for unknowns") {
    val mix = (0L until 4000L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val rates = Map("src0" -> 10000, "src1" -> 0, "src2" -> 2500)
    def run() = Curation.mixingSample(mix, "doc_id", "source", rates,
        defaultE4 = 1000)
      .as[(Long, String)].collect().toSet
    val got = run()
    assert(got == run()) // consistent: identical keep set on re-run
    val bySrc = got.groupBy(_._2).view.mapValues(_.size).toMap
      .withDefaultValue(0)
    assert(bySrc("src0") == 1000) // rate 1.0 keeps every src0 row
    assert(bySrc("src1") == 0)    // rate 0 keeps none
    // hash-rate accuracy: 25% and the 10% default, each over 1000 rows
    assert(math.abs(bySrc("src2") - 250) < 60, s"src2: ${bySrc("src2")}")
    assert(math.abs(bySrc("src3") - 100) < 45, s"src3: ${bySrc("src3")}")
  }

  test("top-n per group: histogram selection ≡ windowed rank, ties included") {
    // scores engineered so every group exercises a different branch:
    // gA crosses the cap inside a tie bucket (boundary quota), gB is
    // under the cap (no crossing bucket → keep all), gC crosses exactly
    // at a bucket edge (quota consumes the whole boundary bucket)
    val rows = Seq(
      ("gA", 1L, 90), ("gA", 2L, 80), ("gA", 3L, 80), ("gA", 4L, 80),
      ("gA", 5L, 70),
      ("gB", 6L, 50), ("gB", 7L, 40),
      ("gC", 8L, 60), ("gC", 9L, 60), ("gC", 10L, 60), ("gC", 11L, 55)
    ).toDF("g", "id", "score")
    val got = Curation.topNPerGroup(rows, "g", "score", "id", n = 3)
      .select("g", "id", "score").as[(String, Long, Int)].collect().toSet
    // windowed rendering (the oracle shape) on the same frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    val want = rows.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")
      .as[(String, Long, Int)].collect().toSet
    assert(got == want)
    assert(got == Set(("gA", 1L, 90), ("gA", 2L, 80), ("gA", 3L, 80),
      ("gB", 6L, 50), ("gB", 7L, 40),
      ("gC", 8L, 60), ("gC", 9L, 60), ("gC", 10L, 60)))
  }

  test("token-budget per group: histogram selection ≡ windowed prefix cut") {
    // gA crosses inside a tie bucket (two ids at score 80 share the
    // boundary; only the smaller fits the residual token quota), gB's
    // total fits the budget (keep all), gC's first doc alone overshoots
    // (straddle-keep), gD crosses exactly at a bucket edge
    val rows = Seq(
      ("gA", 1L, 90, 40L), ("gA", 2L, 80, 35L), ("gA", 3L, 80, 35L),
      ("gA", 4L, 70, 10L),
      ("gB", 5L, 50, 30L), ("gB", 6L, 40, 30L),
      ("gC", 7L, 60, 500L), ("gC", 8L, 55, 10L),
      ("gD", 9L, 20, 50L), ("gD", 10L, 20, 50L), ("gD", 11L, 10, 5L)
    ).toDF("g", "id", "score", "toks")
    def run(budget: Long) =
      Curation.tokenBudgetPerGroup(rows, "g", "score", "id", "toks", budget)
        .select("g", "id").as[(String, Long)].collect().toSet
    // budget 100: gA keeps 40+35 then id=3 (cum_before 75 < 100) — the
    // straddler at the tie bucket; id=4 is out (cum_before 110)
    assert(run(100L) == Set(("gA", 1L), ("gA", 2L), ("gA", 3L),
      ("gB", 5L), ("gB", 6L),
      ("gC", 7L),
      ("gD", 9L), ("gD", 10L)))
    // budget 76: id=3's cum_before 75 < 76 still keeps it; budget 75 cuts
    assert(run(76L).contains(("gA", 3L)) && !run(75L).contains(("gA", 3L)))
    // exact bucket-edge: gD budget 100 consumes both score-20 docs
    // exactly; the score-10 doc has cum_before 100 — out
    assert(!run(100L).contains(("gD", 11L)))
    // randomized differential: selection ≡ the plain windowed rendering
    val rnd = new scala.util.Random(77)
    val big = (0L until 400L).map { i =>
      (s"g${i % 5}", i, rnd.nextInt(8), 1L + rnd.nextInt(30))
    }.toDF("g", "id", "score", "toks")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Seq(37L, 200L, 100000L).foreach { b =>
      val got = Curation.tokenBudgetPerGroup(big, "g", "score", "id", "toks", b)
        .select("g", "id").as[(String, Long)].collect().toSet
      val want = big.withColumn("cb", sum("toks").over(w) - col("toks"))
        .filter(col("cb") < b)
        .select("g", "id").as[(String, Long)].collect().toSet
      assert(got == want, s"budget $b")
    }
  }

  test("sequence packing: two-phase prefix sum ≡ global cumsum") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 300L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(40))("tok").mkString(" "))
    }
    // shuffled input order + a null-text doc: the range repartition must
    // restore id order and the null must be excluded
    val docsDf = (rnd.shuffle(corpus) :+ ((300L, null: String)))
      .toDF("doc_id", "text")
    val got = Curation.packSequences(docsDf, "doc_id", "text",
        ctxLen = 64, parts = 7)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // reference: sequential scan over the id-ordered corpus
    var cum = 0L
    val want = corpus.sortBy(_._1).map { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      val start = cum; cum += n
      (id, n, start, start / 64, (start + n - 1) / 64)
    }
    assert(got.toSeq == want)
    // windows partition the token stream: consecutive docs chain
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 + a._2 == b._3) // next start = prev start + prev len
    }
  }

  test("holdout split: total, stable, and frozen under corpus growth") {
    val v1 = (0L until 2000L).toDF("doc_id")
    def labels(df: org.apache.spark.sql.DataFrame) =
      Curation.holdoutSplit(df, "doc_id", valE4 = 1000)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    val l1 = labels(v1)
    assert(l1.size == 2000 && l1.values.forall(Set("train", "val")))
    // ~10% val at valE4=1000
    val nVal = l1.values.count(_ == "val")
    assert(math.abs(nVal - 200) < 60, s"val count $nVal")
    // corpus growth: every v1 doc keeps its label in the grown corpus
    val l2 = labels((0L until 4000L).toDF("doc_id"))
    assert(l1.forall { case (id, s) => l2(id) == s })
  }

  test("pack windows: read plan covers every token exactly once, no padding") {
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 200L)
      .map(i => (i, Seq.fill(1 + rnd.nextInt(50))("t").mkString(" ")))
      .toDF("doc_id", "text")
    val ctx = 32
    val manifest = Curation.packSequences(corpus, "doc_id", "text", ctx)
    val win = Curation.packWindows(manifest, "doc_id", ctx)
      .as[(Long, Long, Long, Long)].collect()
    val totalTokens = manifest.agg(sum("n_tokens")).as[Long].head()
    // every token is read exactly once across all windows
    assert(win.map(r => r._4 - r._3).sum == totalTokens)
    // every full window reads exactly ctx tokens; the final partial
    // window reads the remainder
    val byBin = win.groupBy(_._1).view
      .mapValues(_.map(r => r._4 - r._3).sum).toMap
    val lastBin = byBin.keys.max
    byBin.foreach { case (b, n) =>
      if (b < lastBin) assert(n == ctx, s"bin $b read $n tokens")
      else assert(n == totalTokens - lastBin * ctx)
    }
    // ranges are doc-local and non-empty
    assert(win.forall(r => r._3 >= 0 && r._3 < r._4))
  }

  test("shuffle order: a stable permutation, ≡ the global windowed rank") {
    val ids = (0L until 500L).toDF("doc_id")
    def run() = Curation.shuffleOrder(ids, "doc_id", parts = 9)
      .as[(Long, Long)].collect().toSet
    val got = run()
    // a permutation of 0..499, stable across runs
    assert(got.map(_._2) == (0L until 500L).toSet)
    assert(got == run())
    // ≡ the single-window rendering (the oracle shape)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(graft.functions.ConsistentHash
        .knuthBucket(col("doc_id"), 1048573), col("doc_id"))
    val want = ids.select(col("doc_id"),
        (row_number().over(w) - 1).cast("bigint").as("r"))
      .as[(Long, Long)].collect().toSet
    assert(got == want)
    // and it actually shuffles: identity order would chain ranks
    assert(got.count { case (id, r) => id == r } < 25)
  }

  test("sequence packing: more partitions than rows still sums globally") {
    val tiny = Seq((1L, "a b"), (2L, "c"), (3L, "d e f")).toDF("doc_id", "text")
    val got = Curation.packSequences(tiny, "doc_id", "text",
        ctxLen = 4, parts = 32)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 0L, 0L, 0L), (2L, 1L, 2L, 0L, 0L),
      (3L, 3L, 3L, 0L, 1L)))
  }

  test("dupAwareEpochs: copies capped, tokens scheduled, hashed ≡ string") {
    // group A: 6 copies (cap 4), 3 tokens; group B: 1 copy, 2 tokens;
    // normalization folds case/punct so "A b! c" joins "a b c"
    val tiny = ((1L to 5L).map(i => (i, "a b c")) ++
      Seq((6L, "A b! c"), (7L, "x y"))).toDF("doc_id", "text")
    val got = Curation.dupAwareEpochs(tiny, "doc_id", "text", capCopies = 4)
      .orderBy("survivor_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 6L, 4L, 12L), (7L, 1L, 1L, 2L)))
    val str = Curation.dupAwareEpochs(tiny, "doc_id", "text",
      capCopies = 4, hashed = false)
    assert(str.exceptAll(Curation.dupAwareEpochs(tiny, "doc_id", "text",
      capCopies = 4)).count() === 0)
  }

  test("mixtureWeights: shares and weights floor-exact") {
    // two strata: en/src0 has 6 tokens, en/src1 has 2 → total 8,
    // shares 7500/2500; target 5000 → weights 6666 / 20000
    val tiny = Seq((1L, "a b c", "en", "src0"), (2L, "d e f", "en", "src0"),
      (3L, "g h", "en", "src1")).toDF("doc_id", "text", "lang", "source")
    val got = Curation.mixtureWeights(tiny, Seq("lang", "source"), "text")
      .orderBy("source")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("en", "src0", 2L, 6L, 7500L, 6666L),
      ("en", "src1", 1L, 2L, 2500L, 20000L)))
  }

  test("mixtureWeights: sub-e4 stratum floors to share 0, weight uses divisor 1") {
    val tiny = (Seq((0L, ("w " * 20000).trim, "en", "big")) ++
      Seq((1L, "x", "en", "tiny"))).toDF("doc_id", "text", "lang", "source")
    val row = Curation.mixtureWeights(tiny, Seq("lang", "source"), "text")
      .filter($"source" === "tiny")
      .as[(String, String, Long, Long, Long, Long)].head()
    assert(row._5 === 0L)            // 1*10000/20001 floors to 0
    assert(row._6 === 50000000L)     // (5000*10000) div max(0,1)
  }

  test("weightedSample: deterministic, weights exposed, n bound, all-docs case") {
    val docs = (0 until 60).map(i =>
        (i.toLong, ("tok " * (1 + i % 7)).trim))
      .toDF("doc_id", "text")
      .unionByName(Seq((999L, null: String)).toDF("doc_id", "text"))
    val a = Curation.weightedSample(docs, "doc_id", "text", n = 10).collect()
    val b = Curation.weightedSample(docs, "doc_id", "text", n = 10).collect()
    assert(a.toSeq === b.toSeq) // no RNG: the draw replays exactly
    assert(a.length === 10)
    // weights are the whitespace token counts of the selected docs
    a.foreach { r =>
      assert(r.getLong(1) === 1 + r.getLong(0) % 7)
      assert(r.getLong(2) < 0) // ln(u) < 0 always: u < 1 by construction
    }
    // n >= corpus: every non-null doc selected exactly once
    val all = Curation.weightedSample(docs, "doc_id", "text", n = 1000).collect()
    assert(all.length === 60)
    assert(all.map(_.getLong(0)).toSet === (0 until 60).map(_.toLong).toSet)
  }

  test("weightedSample: selection is the global top-n of the key ranking") {
    // rank = key_e9/w descending (ln floored BEFORE the weight
    // division), id tie-break — mirror that ordering here
    val docs = (0 until 200).map(i =>
        (i.toLong, s"word$i " * (1 + i % 13))).toDF("doc_id", "text")
    def rank(r: org.apache.spark.sql.Row): (Double, Long) =
      (-(r.getLong(2).toDouble / r.getLong(1)), r.getLong(0))
    val full = Curation.weightedSample(docs, "doc_id", "text", n = 200)
      .collect().map(r => (rank(r), (r.getLong(2), r.getLong(0))))
    val expectTop = full.sortBy(_._1).take(25).map(_._2).toSeq
    val got = Curation.weightedSample(docs, "doc_id", "text", n = 25)
      .collect().map(r => (rank(r), (r.getLong(2), r.getLong(0)))).toSeq
    assert(got.sortBy(_._1).map(_._2) === expectTop)
  }

  test("weightedSample: rank resolution independent of weight (heavy docs)") {
    // pre-fix, w≈1e3-1e4 collapsed keys into ~2150 distinct values and
    // ties resolved by ascending id — with ln floored at e9 first, the
    // keys of 300 long docs must be (near-)distinct so the draw, not
    // the id, decides selection
    val docs = (0 until 300).map(i =>
        (i.toLong, s"w$i " * 2000)).toDF("doc_id", "text")
    val keys = Curation.weightedSample(docs, "doc_id", "text", n = 300)
      .collect().map(_.getLong(2))
    assert(keys.distinct.length >= 295) // ~no tie mass at e9 resolution
  }
}
