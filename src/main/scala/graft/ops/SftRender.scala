package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT training-text rendering over transcript-shaped tables
  * (conv_id, turn_idx, role, text, …) — the step that turns a curated
  * conversation corpus into model-ready training rows.
  *
  * Two ops, designed as a pair:
  *   - [[renderChat]]: each conversation becomes ONE training string,
  *     `<|role|>text` turns joined by a separator, under the stable
  *     (conv_id, turn_idx) ordering the north rule pins ("per-turn text
  *     equality under stable turn ordering").
  *   - [[lossMaskSpans]]: character offsets of each maskRole turn
  *     INSIDE that rendered string — the loss-mask a trainer needs to
  *     supervise only assistant tokens. Computed from prefix sums of
  *     turn lengths (pure integer arithmetic), NOT by re-searching the
  *     rendered text, so it is exact even when turn texts repeat.
  *
  * The pair is self-verifying: substring(rendered, start_off, end_off)
  * must equal the turn's own rendering — asserted in SftRenderSpec on
  * every assistant turn of a shuffled-input corpus.
  *
  * Scale: renderChat is one hash aggregation keyed by conv_id (per-group
  * state bounded by conversation length — transcripts put one turn per
  * row, so partial aggregation collapses map-side); lossMaskSpans is a
  * running window over (conv_id, turn_idx), the same high-cardinality
  * per-conversation window pattern as the stateful metric ops
  * (Stateful.scala) — no global sort, no skew beyond the longest single
  * conversation.
  */
object SftRender {

  /** Render each conversation into one training text: turns sorted by
    * turn_idx, each rendered `<|role|>text`, joined by `sep`.
    * collect_list order is nondeterministic under shuffles — array_sort
    * on struct(turn_idx, …) restores the stable order inside the
    * aggregate (turn_idx is unique per conversation, so the sort is a
    * total order regardless of the trailing struct fields). */
  def renderChat(t: DataFrame, sep: String = "\n"): DataFrame =
    t.groupBy(col("conv_id"))
      .agg(collect_list(struct(col("turn_idx"), col("role"), col("text"))).as("turns"))
      .select(
        col("conv_id"),
        array_join(
          transform(array_sort(col("turns")),
            s => concat(lit("<|"), s("role"), lit("|>"), s("text"))),
          sep).as("rendered"),
        size(col("turns")).as("n_turns"))

  /** DPO-style preference-pair construction: for every (user → assistant)
    * adjacent turn pair, the user text is the PROMPT and the assistant
    * text a candidate RESPONSE; prompts that collected ≥2 distinct
    * responses across the corpus emit one (prompt, chosen, rejected)
    * training pair. The pick is deterministic and integer-decided so a
    * SQL oracle reproduces it bitwise: candidates totally ordered by
    * (-len(resp), resp, conv_id, turn_idx); chosen = order-min (longest
    * response, ties to smallest text/conv/idx), rejected = order-max
    * (shortest, ties to largest). Length is the stand-in for a reward
    * score — swap the first struct field for a model score column and
    * the operator is production DPO pairing.
    *
    * Scale: one lag window per conversation (high-cardinality partition,
    * same pattern as the stateful metric ops) + one aggregation keyed by
    * the prompt. `hashed=true` (default) makes the GROUPING KEY an
    * 8-byte xxhash64(prompt) — cheap comparisons and no giant-key skew
    * pages; the aggregation buffers still carry min(prompt) and the two
    * order structs (each holding one response body), so unlike the pure
    * dedup ops the exchange volume stays O(candidate text), not O(8
    * bytes) — partial aggregation collapses same-prompt candidates
    * map-side first. The oracle runs the string rendering and the spec
    * proves hashed ≡ string. No window over the prompt groups:
    * chosen/rejected come from min/max struct aggregates (rendered as
    * SortAggregate — struct buffers aren't hash-agg mutable — over the
    * already-thin candidate subset). */
  def preferencePairs(t: DataFrame, hashed: Boolean = true): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val cands = t
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        lag(col("text"), 1).over(w).as("prompt"),
        lag(col("role"), 1).over(w).as("prev_role"))
      .filter(col("role") === "assistant" && col("prev_role") === "user" &&
        col("prompt").isNotNull && col("text").isNotNull)
      .select(col("prompt"), col("text").as("resp"), col("conv_id"),
        col("turn_idx"), length(col("text")).cast("bigint").as("len"))
    val key = if (hashed) xxhash64(col("prompt")) else col("prompt")
    val ord = struct((-col("len")).as("nl"), col("resp").as("r"),
      col("conv_id").as("c"), col("turn_idx").as("i"))
    cands.groupBy(key.as("_k"))
      .agg(min(col("prompt")).as("prompt"),
        min(ord).as("best"), max(ord).as("worst"),
        countDistinct(col("resp")).as("n_cands"))
      .filter(col("n_cands") >= 2)
      .select(col("prompt"), col("best.r").as("chosen"),
        col("worst.r").as("rejected"), col("n_cands"))
  }

  /** Context-length histogram of [[renderChat]] output: conversations per
    * power-of-two length bucket (bucket = floor(log2(len))+1, computed as
    * length(bin(len)) — pure integer, no float log), with min/max length
    * per bucket. The pre-training capacity-planning view: how much of the
    * corpus fits a 4k/8k/16k context window. One narrow map over the
    * render aggregate, then a ~60-key hash agg — nothing to shuffle but
    * the bucket counts. */
  def contextLengthHist(t: DataFrame, sep: String = "\n"): DataFrame =
    renderChat(t, sep)
      .select(length(col("rendered")).cast("bigint").as("len"))
      .groupBy(length(bin(col("len"))).cast("int").as("len_bucket"))
      .agg(count(lit(1)).as("n_convs"),
        min(col("len")).as("min_len"), max(col("len")).as("max_len"))

  /** Supervision density per conversation: the share of tokens the loss
    * mask actually supervises (maskRole turns' tokens / all tokens),
    * rendered as a floored e4 integer. SFT corpora with long contexts
    * and one-line answers train slowly per FLOP — this is the metric a
    * pipeline sorts/filters on before paying for training. One hash
    * aggregation keyed by conv_id (partials collapse map-side; turns of
    * a conversation are single rows), zero joins, zero sorts. */
  def supervisionDensity(t: DataFrame, maskRole: String = "assistant"): DataFrame = {
    val toks = TextAnalysis.tokenCountWhitespace(col("text")).cast("bigint")
    t.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === maskRole, toks).otherwise(0L)).as("mask_tokens"),
        sum(toks).as("total_tokens"))
      .select(col("conv_id"), col("n_turns"), col("mask_tokens"),
        col("total_tokens"),
        call_function("div", col("mask_tokens") * lit(10000L),
          greatest(col("total_tokens"), lit(1L))).as("density_e4"))
  }

  /** Per-`maskRole` turn: [start_off, end_off) character offsets of its
    * `<|role|>text` rendering inside [[renderChat]]'s output. start =
    * Σ over prior turns of (len + len(sep)); len = len(role) +
    * len(text) + 4 (the `<|`, `|>` sigils). `sep` MUST match the sep
    * passed to renderChat — a mismatch silently shifts every offset by
    * one per prior turn and the mask supervises the wrong characters.
    * Integer-exact, so DuckDB reproduces it bitwise. */
  def lossMaskSpans(t: DataFrame, maskRole: String = "assistant",
                    sep: String = "\n"): DataFrame = {
    val turnLen = length(col("role")) + length(col("text")) + lit(4)
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.select(col("conv_id"), col("turn_idx"), col("role"), turnLen.as("turn_len"))
      .withColumn("start_off",
        coalesce(sum(col("turn_len") + lit(sep.length.toLong)).over(w), lit(0L))
          .cast("bigint"))
      .filter(col("role") === maskRole)
      .select(col("conv_id"), col("turn_idx"), col("start_off"),
        (col("start_off") + col("turn_len")).cast("bigint").as("end_off"))
  }

  /** Role-alternation hygiene audit — the structural validation an SFT
    * ingest runs before rendering: chat-format trainers require a
    * conversation to OPEN with a `user` or `system` turn and to never
    * repeat a role on adjacent turns (two assistant turns in a row means
    * a lost user message; two user turns means a dropped response).
    * Returns one row per conversation: turn count, count of adjacent
    * same-role repeats, the opening role, and `valid` (1 iff zero
    * repeats and a legal opener) — the predicate the pipeline filters
    * or quarantines on.
    *
    * Scale: one lag window per conversation (high-cardinality
    * (conv_id, turn_idx) partition — the Stateful.scala pattern; no
    * global sort) feeding one hash aggregation keyed by conv_id. The
    * opener is `max(role where turn_idx = 0)` rather than a min_by —
    * turn_idx is dense from 0 by construction, and the conditional max
    * stays inside partial aggregation. */
  def roleAlternationAudit(t: DataFrame,
                           validOpeners: Seq[String] = Seq("user", "system")): DataFrame = {
    require(validOpeners.nonEmpty, "roleAlternationAudit: validOpeners must be non-empty")
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    t.select(col("conv_id"), col("turn_idx"), col("role"),
        lag(col("role"), 1).over(w).as("prev_role"))
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("n_repeat_role"),
        max(when(col("turn_idx") === 0, col("role"))).as("first_role"))
      .select(col("conv_id"), col("n_turns"), col("n_repeat_role"),
        col("first_role"),
        when(col("n_repeat_role") === 0 &&
          col("first_role").isin(validOpeners.map(lit): _*), 1)
          .otherwise(0).as("valid"))
  }

  /** Prompt-prefix dedup groups — exact dedup of conversations that share
    * their first `k` turns (digit-normalized): the standard SFT hygiene
    * pass for prompt-seeded corpora, where one seed prompt fans out into
    * many generations and training must keep one (or downweight the
    * group — the d41 epochs op consumes exactly this group shape).
    * Digit normalization (the p63/d12 CCNet trick) collapses ids,
    * counters, and amounts so `user=17` and `user=3` seeds collide.
    * Emits one row per group with ≥2 conversations: the normalized
    * prefix, member count, and the canonical survivor (min conv_id).
    *
    * Scale: the prefix IS [[renderChat]] over the first `k` digit-
    * normalized turns (one conv-keyed aggregation — reusing the render
    * keeps the tag/separator/sort contract in one place; p67 composes
    * the same way), then ONE aggregation groups prefixes.
    * `hashed=true` (production default) keys that shuffle with
    * xxhash64(prefix) — 8-byte keys, prefix string rides as a min
    * payload; `hashed=false` groups raw strings so a SQL oracle
    * reproduces it — the spec proves both identical. */
  def prefixDedupGroups(t: DataFrame, k: Int = 2,
                        hashed: Boolean = true): DataFrame = {
    require(k > 0, s"prefixDedupGroups: k must be positive, got $k")
    val pfx = renderChat(
      t.filter(col("turn_idx") < k)
        .withColumn("text", TextAnalysis.normalizeDigits(col("text"))))
      .select(col("conv_id"), col("rendered").as("prefix"))
    val key = if (hashed) xxhash64(col("prefix")) else col("prefix")
    pfx.groupBy(key.as("_k"))
      .agg(min(col("prefix")).as("prefix"),
        count(lit(1)).as("n_convs"),
        min(col("conv_id")).as("survivor"))
      .filter(col("n_convs") >= 2)
      .select(col("prefix"), col("n_convs"), col("survivor"))
  }

  /** Context-window truncation audit — keep the LONGEST SUFFIX of each
    * conversation that fits a token budget (the standard chat-history
    * truncation: recent turns survive, the oldest spill). A turn is kept
    * iff the running token total from the conversation's END back to and
    * including that turn is ≤ `maxTokens`; the suffix sum is monotone
    * walking backwards, so the greedy cut is exact per-turn. Returns the
    * per-conversation audit (total/kept turn and token counts, truncated
    * flag) a packing stage budgets from. Tokens =
    * [[TextAnalysis.tokenCountWhitespace]] (the d02/p62 proxy — note
    * [[Curation.packSequences]] counts `split(text, " ")` empties-kept
    * to match its manifest oracle; the two agree on single-spaced text
    * like this corpus, and a deployment must standardize on ONE proxy
    * before using this audit to budget that packer). Swap the column
    * expression for a real tokenizer count at integration.
    *
    * Scale: one running window per conversation ordered by turn_idx
    * DESC (high-cardinality partition, explicit ROWS frame) feeding one
    * hash aggregation keyed by conv_id — no join, no global sort. */
  def contextTruncate(t: DataFrame, maxTokens: Long = 256L): DataFrame = {
    require(maxTokens > 0, s"contextTruncate: maxTokens must be positive, got $maxTokens")
    val toks = TextAnalysis.tokenCountWhitespace(col("text")).cast("bigint")
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.select(col("conv_id"), col("turn_idx"), toks.as("toks"))
      .withColumn("sfx", sum(col("toks")).over(w))
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns_total"),
        sum(col("toks")).as("total_tokens"),
        sum(when(col("sfx") <= maxTokens, 1L).otherwise(0L)).as("n_turns_kept"),
        sum(when(col("sfx") <= maxTokens, col("toks")).otherwise(0L))
          .as("tokens_kept"))
      .withColumn("truncated",
        when(col("n_turns_kept") < col("n_turns_total"), 1).otherwise(0))
  }
}
