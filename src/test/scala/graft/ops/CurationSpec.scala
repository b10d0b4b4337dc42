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
}
