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
    * surface), deterministically tie-broken by id. A windowed top-k
    * bounds memory per group BEFORE the collect (no unbounded
    * collect_list on hot dimensions), and the aggregate runs on the
    * full frame alongside it.
    */
  def callsWithExemplars(spans: DataFrame, dims: Seq[String], durCol: String,
                         idCol: String, maxPerDataPoint: Int): DataFrame = {
    val keys = dims.map(col)
    // ONE scan, ONE shuffle: calls/sum as unbounded windows over the
    // same partitioning that ranks the exemplars (the sort is computed
    // once), then the k exemplar rows per group carry the totals into
    // the final collect. The alternative agg-branch + topk-branch join
    // scans the span input twice and shuffles twice.
    // Tie-break DESC on id so selection order matches the presentation
    // order of sort_array(desc) over struct(value, span_id).
    val byKey = Window.partitionBy(keys: _*)
    val w = byKey.orderBy(col(durCol).desc, col(idCol).desc)
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
    val lastSeen = spans.groupBy(keys: _*)
      .agg(max(col(tsCol).cast("timestamp")).as("_last_seen"))
    // "now" for a batch = the max event time in the frame (the batch
    // analog of the connector's wall clock at flush) — broadcast as a
    // 1-row frame instead of an eager driver-side action
    val nowDf = spans.agg(max(col(tsCol).cast("timestamp")).as("_now"))
    lastSeen
      .crossJoin(broadcast(nowDf))
      .filter(col("_last_seen") >= col("_now") - expr(s"INTERVAL $expiration"))
      .select(keys: _*)
      .join(spans, dims)
  }
}
