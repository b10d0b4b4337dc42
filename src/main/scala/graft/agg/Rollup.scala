package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-conversation rollup — the recombine transformer re-expressed as a
  * grouped sort-merge (SURVEY.md §2.3).
  *
  * Reference (`pkg/stanza/operator/transformer/recombine/transformer.go:
  * 95-227` in `/root/reference`): group by source id, concatenate
  * `combine_field` with `combine_with`, preserving arrival order. Our
  * order key is explicit — stable (conv_id, turn_idx) per the north rule —
  * so the result is independent of arrival/partition order.
  *
  * Skew (north rule): a hot conv_id (10^4+ turns) makes a plain
  * `groupBy(conv_id)` put the whole conversation in one reducer.
  * [[rollupSalted]] is the two-phase rendering: phase 1 groups by
  * (conv_id, salt) — salt derived from turn_idx, so hot conversations
  * spread over S reducers and partial arrays stay bounded; phase 2 merges
  * the ≤S partials per conversation. Both phases carry the order key, so
  * the final text equals the unsalted result exactly ([[rollup]] ≡
  * [[rollupSalted]] — property-tested).
  */
object Rollup {

  /** Plain rollup: one output row per conv_id with turn-count, span and
    * the texts concatenated in turn_idx order. */
  def rollup(turns: DataFrame, sep: String = "\n"): DataFrame =
    turns.groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        min("ts").as("first_ts"),
        max("ts").as("last_ts"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("turn_idx"), col("text")))),
            x => x.getField("text")),
          sep).as("full_text"))

  /** Salted two-phase rollup for hot-conversation skew. The salt is the
    * CONTIGUOUS turn-block `turn_idx / blockSize` (not a modulo): blocks
    * cover disjoint turn ranges, so phase 1 fully sorts+concatenates each
    * block into one string, and phase 2 only orders the (few) block
    * strings — the hot conversation's row-level sort work spreads over
    * ceil(n/blockSize) reducers, and the final task touches S strings
    * instead of n rows. */
  def rollupSalted(turns: DataFrame, blockSize: Int = 8192, sep: String = "\n"): DataFrame = {
    val partial = turns
      .withColumn("_block", (col("turn_idx") / blockSize).cast("long"))
      .groupBy(col("conv_id"), col("_block"))
      .agg(
        count(lit(1)).as("_n"),
        min("ts").as("_min_ts"),
        max("ts").as("_max_ts"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("turn_idx"), col("text")))),
            x => x.getField("text")),
          sep).as("_chunk"))
    partial.groupBy("conv_id")
      .agg(
        sum("_n").as("n_turns"),
        min("_min_ts").as("first_ts"),
        max("_max_ts").as("last_ts"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("_block"), col("_chunk")))),
            x => x.getField("_chunk")),
          sep).as("full_text"))
  }
}
