package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** spanmetrics connector extensions beyond the bucket/calls core:
  * exemplars and metrics_expiration
  * (`connector/spanmetricsconnector/config.go:47,72`,
  * `connector.go:367,408` in `/root/reference`).
  */
object SpanMetrics {

  /** calls + sum + up-to-k exemplars per (dimensions) group.
    *
    * The reference attaches (trace_id, span_id, value) samples to each
    * data point, capped at `exemplars.max_per_data_point`
    * (`connector.go:408`), keeping arrival-order samples. Arrival order
    * does not exist in a distributed batch engine, so the rendering
    * keeps the k LARGEST durations (the outliers an exemplar exists to
    * surface), deterministically tie-broken by id.
    *
    * ONE hash-aggregate with map-side partials: calls/sum as built-in
    * aggregates, exemplars via the bounded [[TopKExemplars]] aggregator
    * (O(k) state per group per partition, associative merges). The
    * round-2 `row_number().over(Window)` rendering shuffled every span
    * of a group to one reducer and fully sorted it — a serialization
    * point on a hot `tool` value at 10^12 spans; it survives as
    * [[callsWithExemplarsWindowed]], the differential oracle
    * (SpanMetricsSpec asserts frame equality).
    */
  def callsWithExemplars(spans: DataFrame, dims: Seq[String], durCol: String,
                         idCol: String, maxPerDataPoint: Int): DataFrame = {
    val keys = dims.map(col)
    spans.groupBy(keys: _*)
      .agg(count(lit(1)).as("calls"),
        sum(durCol).as("sum_dur"),
        TopKExemplars.of(col(durCol).cast("bigint"), col(idCol),
          maxPerDataPoint).as("exemplars"))
  }

  /** Round-2 window rendering — kept as the differential oracle for
    * [[callsWithExemplars]]: bounds memory per group before the collect,
    * but partitions the FULL span set by the dimension key and sorts it,
    * which serializes hot groups at scale. */
  def callsWithExemplarsWindowed(spans: DataFrame, dims: Seq[String], durCol: String,
                                 idCol: String, maxPerDataPoint: Int): DataFrame = {
    val keys = dims.map(col)
    val byKey = Window.partitionBy(keys: _*)
    // rank by the SAME bigint-truncated duration the aggregator
    // receives — ordering by the raw column would select different
    // exemplars for fractional durations (5.7 outranking 5.2 here while
    // the aggregator sees the 5===5 tie and breaks on id), breaking the
    // frame-equality contract between the two renderings
    val w = byKey.orderBy(col(durCol).cast("bigint").desc, col(idCol).desc)
    spans
      .withColumn("_rn", row_number().over(w))
      .withColumn("calls", count(lit(1)).over(byKey))
      .withColumn("sum_dur", sum(durCol).over(byKey))
      .filter(col("_rn") <= maxPerDataPoint)
      .groupBy((keys :+ col("calls") :+ col("sum_dur")): _*)
      .agg(sort_array(collect_list(struct(
        col(durCol).cast("bigint").as("value"), col(idCol).as("span_id"))), asc = false)
        .as("exemplars"))
      .select((keys :+ col("calls") :+ col("sum_dur") :+ col("exemplars")): _*)
  }

  /** metrics_expiration (`config.go:72`): groups receiving no spans for
    * `expiration` before the dataset's max timestamp are stale and not
    * exported. 0 = never expire (reference default). */
  def withExpiration(spans: DataFrame, dims: Seq[String], tsCol: String,
                     expiration: String): DataFrame = {
    val keys = dims.map(col)
    // 0 disables expiration (the reference default, config.go:72): the
    // generic filter below would otherwise keep ONLY groups active at
    // the dataset's single max event time — the exact opposite. Disabled
    // means every span row passes through unchanged, matching the normal
    // path's shape (span rows of surviving groups), not a dim projection.
    if (expiration.trim.takeWhile(c => c.isDigit || c == '.')
        .toDoubleOption.contains(0.0)) {
      return spans
    }
    val lastSeen = spans.groupBy(keys: _*)
      .agg(max(col(tsCol).cast("timestamp")).as("_last_seen"))
    // "now" for a batch = the max event time in the frame (the batch
    // analog of the connector's wall clock at flush) — derived from the
    // small per-group frame (max of group maxes), NOT a third scan of
    // the span input, and broadcast as a 1-row frame instead of an
    // eager driver-side action
    val nowDf = lastSeen.agg(max(col("_last_seen")).as("_now"))
    lastSeen
      .crossJoin(broadcast(nowDf))
      .filter(col("_last_seen") >= col("_now") - expr(s"INTERVAL $expiration"))
      .select(keys: _*)
      .join(spans, dims)
  }
}
