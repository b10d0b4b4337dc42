package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Base-2 exponential histogram aggregator — the spanmetrics connector's
  * exponential-bucket duration histogram
  * (`connector/spanmetricsconnector/connector.go:328-406`, bucket config
  * `config.go:101` in `/root/reference`) as a typed Spark `Aggregator`.
  *
  * Bucket index of value v>0 is floor(log2(v)) (scale-0 exponential
  * histogram; OpenTelemetry's format at scale 0), computed integer-exactly
  * via numberOfLeadingZeros. Values ≤0 land in the underflow bucket (-1).
  *
  * Why a custom Aggregator (SURVEY.md §4): built-in aggregates can't
  * produce a bucket-array in one pass without an explode+groupBy detour;
  * this keeps the group-by key space small (one row per group, counts as
  * an array) — at 10^12 rows the shuffle carries one fixed-size buffer
  * per (group × partition), merged associatively.
  */
object ExpHistogram {

  val NumBuckets = 64 // bucket i counts values in [2^i, 2^(i+1)); +1 underflow

  final case class Buf(var underflow: Long, counts: Array[Long],
                       var total: Long, var sum: Long, var max: Long)

  private def emptyBuf = Buf(0L, new Array[Long](NumBuckets), 0L, 0L, Long.MinValue)

  final case class Result(bucket_counts: Seq[Long], underflow: Long,
                          total: Long, sum: Long, max: Long)

  def bucketOf(v: Long): Int =
    if (v <= 0) -1 else 63 - java.lang.Long.numberOfLeadingZeros(v)

  // boxed input, NOT Long: the primitive encoder coerces a NULL input
  // to 0L (the hazard TopKExemplars.scala documents), which would count
  // every null duration as a real underflow observation — SQL aggregate
  // semantics skip nulls, and so must this
  val aggregator: Aggregator[java.lang.Long, Buf, Result] =
      new Aggregator[java.lang.Long, Buf, Result] {
    def zero: Buf = emptyBuf
    def reduce(b: Buf, boxed: java.lang.Long): Buf = {
      if (boxed == null) return b
      val v = boxed.longValue
      val i = bucketOf(v)
      if (i < 0) b.underflow += 1 else b.counts(i) += 1
      b.total += 1; b.sum += v; if (v > b.max) b.max = v
      b
    }
    def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < NumBuckets) { a.counts(i) += b.counts(i); i += 1 }
      a.underflow += b.underflow; a.total += b.total; a.sum += b.sum
      if (b.max > a.max) a.max = b.max
      a
    }
    def finish(b: Buf): Result =
      Result(b.counts.toSeq, b.underflow, b.total, b.sum,
        if (b.total == 0) 0L else b.max)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Result] = Encoders.product[Result]
  }

  /** UDAF form usable with any long-valued column:
    * `df.groupBy("tool").agg(ExpHistogram.udaf(col("dur_ms")).as("hist"))`. */
  lazy val udaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(aggregator)

  /** Histogram column applied to `c`. */
  def of(c: Column): Column = udaf(c)
}
