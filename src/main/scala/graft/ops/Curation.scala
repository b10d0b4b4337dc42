package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end curation decision: composes the suite's independent
  * signals — exact-dup survivorship, benchmark contamination, Gopher
  * repetition, quality score — into one keep/drop verdict per document
  * with the FIRST failing check as the reason (checks ordered by
  * severity: a duplicate is dropped as `exact_dup` even if it is also
  * contaminated, so drop tallies partition cleanly). This is the query
  * a 100 TB pre-training pipeline actually runs: one call, one frame of
  * (doc_id, keep, reason) driving the delete pass.
  *
  * Thresholds compare FLOORED e4 integers, never raw doubles, so the
  * cut is bit-stable across engines (same trick as
  * [[TextAnalysis.repetitionMetrics]]'s `repetitive` flag).
  *
  * Scale design: every branch keys its shuffle by the 8-byte doc id or
  * an 8-byte content hash (`hashed=true`, production default — the
  * survivor join carries xxhash64(text), not documents; contamination
  * and repetition ride their own hashed paths); the corpus is scanned
  * once per signal and never cached (scan-bound beats caching 10^12
  * rows). Docs shorter than 3 tokens carry no n-gram evidence: their
  * contamination/repetition signals default to clean and only the
  * dup + quality checks apply.
  *
  * The repetitive check additionally requires ≥ `minRepetitionTokens`
  * tokens: the Gopher thresholds assume long documents, and a tiny doc
  * trivially exceeds them by pigeonhole (4 distinct bigrams → top share
  * 2500 > the 2000 cut), which would mis-drop short clean text.
  *
  * NULL-text documents are decided up front as `empty` (dropped) —
  * they never enter the survivor join, where the hashed and string
  * renderings would otherwise disagree (xxhash64 skips null children
  * and returns its seed, while an equi-join drops null keys).
  */
object Curation {

  def decide(docs: DataFrame, idCol: String, textCol: String,
             benchmark: DataFrame, benchTextCol: String,
             contamThresholdE4: Long = 5000L,
             qualityThresholdE4: Long = 5500L,
             minRepetitionTokens: Int = 10,
             hashed: Boolean = true): DataFrame = {
    val key: Column = if (hashed) xxhash64(col(textCol)) else col(textCol)
    val empties = docs.filter(col(textCol).isNull)
      .select(col(idCol), lit("empty").as("reason"), lit(false).as("keep"))
    val nonNull = docs.filter(col(textCol).isNotNull)
    val d = nonNull.select(col(idCol), key.as("_tkey"))
    val surv = d.groupBy("_tkey").agg(min(idCol).as("_keep_id"))
    val withSurv = d.join(surv, Seq("_tkey"))
      .select(col(idCol), (col(idCol) === col("_keep_id")).as("_survivor"))
    val contam = TextAnalysis.contamination(nonNull, idCol, textCol,
        benchmark, benchTextCol, n = 3, hashed = hashed)
      .select(col(idCol),
        floor(col("contamination") * 10000).cast("bigint").as("_contam_e4"))
    val rep = TextAnalysis.repetitionMetrics(nonNull, idCol, textCol, hashed)
      .select(col(idCol),
        (col("repetitive") && col("n_tokens") >= minRepetitionTokens)
          .as("_repetitive"))
    val qual = nonNull.select(col(idCol),
      floor(TextAnalysis.qualityMetrics(col(textCol))
        .getField("quality_score") * 10000).cast("bigint").as("_quality_e4"))
    val reason = when(!col("_survivor"), "exact_dup")
      .when(coalesce(col("_contam_e4"), lit(0L)) >= contamThresholdE4,
        "contaminated")
      .when(coalesce(col("_repetitive"), lit(false)), "repetitive")
      .when(col("_quality_e4") < qualityThresholdE4, "low_quality")
      .otherwise("keep")
    withSurv
      .join(contam, Seq(idCol), "left")
      .join(rep, Seq(idCol), "left")
      .join(qual, Seq(idCol))
      .select(col(idCol), reason.as("reason"))
      .withColumn("keep", col("reason") === "keep")
      .unionByName(empties)
  }
}
