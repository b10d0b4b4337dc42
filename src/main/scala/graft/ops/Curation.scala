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

  /** Dataset-mixing sampler: keep each row with a per-source rate — the
    * curation step that turns a source-weighted mixture recipe ("10% of
    * src0, 40% of src7, …") into a concrete keep set. The verdict is a
    * DETERMINISTIC pure-column expression on (id, source): the same
    * 31-bit-masked Knuth multiplicative hash as the probabilistic
    * sampler (see p23 / ParseStage.dropRatioFilter), compared against
    * the source's rate in e4 integer space. Zero shuffle, zero state —
    * at 10^12 rows this is a codegen filter inside the scan stage, and
    * re-running it (or running it per-partition, per-day, resumed after
    * a kill) keeps exactly the same rows.
    *
    * `ratesE4` is a plan-time literal map (sources are a config-sized
    * set, like the route table); unknown sources fall to `defaultE4`. */
  def mixingSample(docs: DataFrame, idCol: String, sourceCol: String,
                   ratesE4: Map[String, Int],
                   defaultE4: Int = 0): DataFrame = {
    (ratesE4.values.toSeq :+ defaultE4).foreach(r =>
      require(r >= 0 && r <= 10000,
        s"mixingSample: rates are e4 fractions in [0, 10000], got $r"))
    val rate: Column = ratesE4.foldLeft(lit(defaultE4)) {
      case (acc, (src, r)) => when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    docs.filter(
      graft.functions.ConsistentHash.knuthBucket(col(idCol), 10000) < rate)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006
    * A-Res): each doc draws a deterministic uniform
    * `u = (fingerprint(text)+1)/(M+1) ∈ (0,1]` and ranks by the
    * exponential key `ln(u)/w` (monotone with the paper's `u^(1/w)`);
    * the top-n keys are the sample, so a doc's selection probability
    * is proportional to its weight and the draw replays bit-stably
    * from the data alone — same no-RNG property as [[mixingSample]].
    * Weight here = whitespace token count (longer docs proportionally
    * likelier, the length-balanced epoch-sampling shape); zero-token
    * docs get w=1 so they stay sampleable.
    *
    * The ONE float is `floor(1e9·ln(u))` — the d25/d30/d45 hazard
    * class: ln is evaluated once per doc on both engines and floored
    * at e9 BEFORE the weight division, so the rank resolution
    * (~4×10^10 distinct values over ln's range) is independent of
    * document length. The first version floored AFTER dividing by w
    * (`floor(1e6·ln(u)/w)`), which shrank resolution with w — at
    * w≈1e4 only ~2150 distinct keys existed and the top-n cut fell
    * inside large tie masses resolved by ascending id, deterministically
    * biasing selection among long docs toward low ids instead of by the
    * draw. The ranking division `key_e9/w` is exact-int-over-exact-int
    * in IEEE double (|key_e9| ≤ 2.2e10 < 2^53), correctly rounded and
    * therefore bitwise identical on any engine; ties break by id.
    * Scale: key computation is a narrow codegen map; top-n is
    * TakeOrderedAndProject — per-partition partial top-n, ~n rows per
    * partition to the driver-side merge, NO full sort, no shuffle of
    * the corpus. */
  def weightedSample(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    require(n > 0, s"weightedSample: n must be positive, got $n")
    val M = 2147483647L
    val w = greatest(size(split(col(textCol), " ")), lit(1))
    val u = (TextAnalysis.fingerprint(col(textCol)) + lit(1L)).cast("double") /
      lit((M + 1).toDouble)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), w.cast("bigint").as("w_tokens"),
        floor(lit(1e9) * log(u)).cast("bigint").as("key_e9"))
      .orderBy((col("key_e9").cast("double") / col("w_tokens")).desc,
        col(idCol).asc)
      .limit(n)
  }

  /** Stable train/validation holdout labels: a document's split is a
    * pure function of its id (the same Knuth verdict as
    * [[mixingSample]]), so the assignment survives corpus growth,
    * reshuffles, retries, and resumes — a doc NEVER migrates between
    * train and val as the corpus evolves, which is the property that
    * keeps a held-out set honest across dataset versions. Zero shuffle:
    * a codegen projection in the scan stage. */
  def holdoutSplit(docs: DataFrame, idCol: String,
                   valE4: Int): DataFrame = {
    require(valE4 >= 0 && valE4 <= 10000,
      s"holdoutSplit: valE4 must be in [0, 10000], got $valE4")
    require(!docs.columns.contains("split"),
      "holdoutSplit: input already has a 'split' column — refusing to" +
        " silently overwrite an existing assignment")
    docs.withColumn("split",
      when(graft.functions.ConsistentHash.knuthBucket(col(idCol), 10000)
        < valE4, "val").otherwise("train"))
  }

  /** Exact per-group top-N WITHOUT a per-group sort — the per-source
    * cap ("keep at most N docs per domain, best score first") that a
    * window `row_number() ≤ N` expresses but cannot survive at scale:
    * ranking 10^9 rows inside one hot source is a single-task sort.
    * Instead: selection via a score histogram.
    *
    *  1. `hist` = count per (group, score) — the only full-corpus
    *     shuffle, and it carries counts, not rows (score is an e4-floored
    *     int, so the histogram is bounded by |groups| × |score buckets|,
    *     orders of magnitude smaller than the corpus).
    *  2. A window cumsum over the HISTOGRAM (per group, score desc)
    *     finds each group's threshold bucket: the score where the
    *     running count crosses N, plus the residual quota inside it.
    *     The window sorts buckets, never corpus rows.
    *  3. Rows strictly above the threshold are kept by a broadcast-join
    *     filter; rows AT the threshold take the residual quota by
    *     `idCol` asc — a row_number restricted to the boundary bucket,
    *     whose per-group size is one histogram bucket, not the corpus.
    *
    * Groups with fewer than N rows have no crossing bucket and keep
    * everything. Ties are fully deterministic: score desc, then id asc
    * — bit-identical to the plain windowed rendering (the DuckDB oracle
    * runs exactly that). Null scores never qualify and are filtered up
    * front — ranking them would both diverge from a SQL oracle (Spark
    * sorts DESC nulls-last, DuckDB nulls-first) and collide with the
    * `_thr IS NULL` = "group under cap" branch below, silently
    * over-keeping. Ids are assumed unique within a group. */
  def topNPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   idCol: String, n: Int): DataFrame = {
    require(n > 0, s"topNPerGroup: n must be positive, got $n")
    val reserved = Seq("_c", "_cum", "_cum_above", "_thr", "_quota", "_r")
    require(!df.columns.exists(reserved.contains),
      s"topNPerGroup: input must not carry internal columns $reserved")
    // pin the scored manifest ONCE (r6): three consumers walk it (the
    // histogram, the above-threshold branch, the boundary branch), and
    // without the checkpoint each re-ran the caller's scoring
    // projection over the corpus — 3× the per-row score cost (d28's
    // qualityMetrics was the measured offender in the sibling
    // function). Callers pass the narrow (group, score, id[, tokens])
    // manifest per the scale contract, so the pinned blocks are
    // manifest-sized, the cumBefore discipline.
    val rows = df.filter(col(scoreCol).isNotNull).localCheckpoint(true)
    val hist = rows.groupBy(groupCol, scoreCol).agg(count(lit(1)).as("_c"))
    val wh = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol).desc)
    val cum = hist.withColumn("_cum", sum("_c").over(wh))
      .withColumn("_cum_above", col("_cum") - col("_c"))
    val thr = cum.filter(col("_cum_above") < n && col("_cum") >= n)
      .select(col(groupCol), col(scoreCol).as("_thr"),
        (lit(n.toLong) - col("_cum_above")).as("_quota"))
      // one row per capped group — materialize so the above/boundary
      // branches don't each recompute the full-corpus histogram
      .localCheckpoint(true)
    val tagged = rows.join(broadcast(thr), Seq(groupCol), "left")
    val above = tagged.filter(col("_thr").isNull || col(scoreCol) > col("_thr"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(idCol))
    val boundary = tagged.filter(col(scoreCol) === col("_thr"))
      .withColumn("_r", row_number().over(wb))
      .filter(col("_r") <= col("_quota")).drop("_r")
    above.unionByName(boundary).drop("_thr", "_quota")
  }

  /** Per-group TOKEN-BUDGET cap: keep each group's docs best-score-first
    * until the group's token budget is spent — the mixture step a
    * pretraining recipe actually specifies ("N billion tokens of src7,
    * best quality first"), where [[topNPerGroup]]'s doc-count cap is the
    * wrong unit. A doc is kept iff the tokens of all strictly-better
    * rows (score desc, id asc) are < `budget` — a pure prefix cut, so
    * the doc that straddles the boundary is kept (overshoot < its own
    * length) and the plain windowed-cumsum rendering is the oracle.
    *
    * Same histogram-selection shape as [[topNPerGroup]] — sources are a
    * config-sized set, so a corpus-row window keyed by source is a
    * single-task sort of the hottest source at 10^12 rows:
    *  1. histogram = sum of tokens per (group, score) — the only
    *     full-corpus shuffle, carrying two longs per bucket;
    *  2. cumsum over the HISTOGRAM per group (score desc) finds the
    *     threshold score where running tokens cross the budget, plus
    *     the residual token quota inside that bucket;
    *  3. rows strictly above the threshold are kept via broadcast-join
    *     filter; rows AT the threshold run a within-bucket cumsum
    *     (id asc) and keep while below the residual quota — the window
    *     sorts one histogram bucket, not the corpus.
    *
    * Groups whose total fits the budget have no crossing bucket and
    * keep everything. Exactness: a kept boundary row's global
    * tokens-before = bucket's cum-above + within-bucket cum-before, so
    * `within < quota ⇔ global < budget` — bit-identical to the windowed
    * rendering, ties and all. Null scores/tokens are filtered up front
    * (same contract as [[topNPerGroup]]); ids unique within a group. */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                          idCol: String, tokensCol: String,
                          budget: Long): DataFrame = {
    require(budget > 0, s"tokenBudgetPerGroup: budget must be positive, got $budget")
    val reserved = Seq("_tc", "_cum", "_cum_above", "_thr", "_quota", "_cb")
    require(!df.columns.exists(reserved.contains),
      s"tokenBudgetPerGroup: input must not carry internal columns $reserved")
    // pin the scored manifest ONCE — see [[topNPerGroup]] (r6): the
    // histogram + two kept branches each re-ran the caller's scoring
    // projection (d28: 3× qualityMetrics over the corpus, measured)
    val rows = df.filter(col(scoreCol).isNotNull && col(tokensCol).isNotNull)
      .localCheckpoint(true)
    val hist = rows.groupBy(groupCol, scoreCol)
      .agg(sum(tokensCol).cast("bigint").as("_tc"))
    val wh = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol).desc)
    val cum = hist.withColumn("_cum", sum("_tc").over(wh))
      .withColumn("_cum_above", col("_cum") - col("_tc"))
    val thr = cum.filter(col("_cum_above") < budget && col("_cum") >= budget)
      .select(col(groupCol), col(scoreCol).as("_thr"),
        (lit(budget) - col("_cum_above")).as("_quota"))
      .localCheckpoint(true)
    val tagged = rows.join(broadcast(thr), Seq(groupCol), "left")
    val above = tagged.filter(col("_thr").isNull || col(scoreCol) > col("_thr"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(idCol))
    val boundary = tagged.filter(col(scoreCol) === col("_thr"))
      .withColumn("_cb", sum(tokensCol).over(wb) - col(tokensCol))
      .filter(col("_cb") < col("_quota")).drop("_cb")
    above.unionByName(boundary).drop("_thr", "_quota")
  }

  /** Sequence packing manifest: concatenate the corpus in `idCol` order
    * and cut it into fixed `ctxLen`-token training windows; emit, per
    * document, its global token offset and the first/last window it
    * lands in (documents may straddle a window boundary — the usual
    * pack-then-split pretraining layout). The manifest is what a reader
    * needs to materialize any window: scan the docs whose
    * [bin_first, bin_last] range covers it.
    *
    * The global running total is the textbook two-phase distributed
    * prefix sum — a single-partition `Window.orderBy(id)` cumsum would
    * serialize 10^12 rows through one task:
    *  1. range-repartition by id (partition p holds an id range below
    *     partition p+1's — RangePartitioner assigns ascending ranges to
    *     ascending partition ids);
    *  2. per-partition token totals — `parts` numbers, collected to the
    *     driver, scanned into per-partition global offsets (the one
    *     driver action, O(parts), same class as the IVF centroid pull);
    *  3. within-partition cumsum (window keyed by partition id —
    *     parallel across partitions) + the broadcast offset.
    *
    * Token counts use the d02 whitespace idiom (`split(text, " ")`,
    * empties kept) so the manifest agrees with the suite's token
    * accounting; null-text docs carry no tokens and are excluded. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    ctxLen: Int, parts: Int = 32): DataFrame = {
    require(ctxLen > 0, s"packSequences: ctxLen must be positive, got $ctxLen")
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        size(split(col(textCol), " ")).cast("bigint").as("n_tokens"))
    cumBefore(toks, Seq(col(idCol)), col("n_tokens"), parts)
      .withColumnRenamed("_cum_before", "token_start")
      .select(col(idCol), col("n_tokens"), col("token_start"),
        expr(s"token_start div $ctxLen").as("bin_first"),
        expr(s"(token_start + n_tokens - 1) div $ctxLen").as("bin_last"))
  }

  /** The reader side of [[packSequences]]: explode the manifest into
    * one row per (training window, document) pair — window `bin_id`
    * reads doc-local tokens [tok_from, tok_to). This is the exact read
    * plan a window materializer executes; rows per doc = number of
    * windows it straddles (almost always 1-2), so the explode is
    * output-proportional, not quadratic. Per-bin `tok_to - tok_from`
    * sums to exactly ctxLen for every full window — the no-padding
    * invariant the spec asserts. */
  def packWindows(manifest: DataFrame, idCol: String,
                  ctxLen: Int): DataFrame = {
    require(ctxLen > 0, s"packWindows: ctxLen must be positive, got $ctxLen")
    manifest
      .withColumn("bin_id",
        explode(sequence(col("bin_first"), col("bin_last"))))
      .select(col("bin_id"), col(idCol),
        greatest(lit(0L), col("bin_id") * ctxLen - col("token_start"))
          .as("tok_from"),
        least(col("n_tokens"),
          (col("bin_id") + 1) * ctxLen - col("token_start")).as("tok_to"))
  }

  /** Deterministic global shuffle order for training: every row gets a
    * stable 0-based `shuffle_rank` under the pseudo-random permutation
    * `sort by (knuthBucket(id), id)` — the corpus-shuffle step before
    * packing, reproducible across retries/resumes because the key is a
    * pure function of the row (no rand(), which would break recompute
    * determinism and resumability at 10^12 rows). The rank is the same
    * two-phase prefix sum as [[packSequences]] with value 1 — a global
    * `row_number()` window would serialize the corpus through one task.
    * Feed the ranked frame to [[packSequences]]' idCol = shuffle_rank
    * to pack in shuffled order. */
  def shuffleOrder(docs: DataFrame, idCol: String,
                   parts: Int = 32): DataFrame = {
    // rank over the NARROW manifest (id, knuth key) only — r6: the old
    // shape pushed the FULL doc row (text included) through cumBefore's
    // range shuffle and its eager pid-pinning localCheckpoint, and a
    // rank-only consumer (d21) could not column-prune through the
    // checkpoint, so the corpus text was shuffled and block-cached for
    // nothing. Input columns still carry through (the documented
    // packSequences composition) via an 8-byte-key equi-join; a
    // rank-only consumer now prunes the join to id columns on both
    // sides and the text never moves.
    val keyed = docs.select(col(idCol)).withColumn("_k",
      graft.functions.ConsistentHash.knuthBucket(col(idCol), 1048573))
    val ranks = cumBefore(keyed, Seq(col("_k"), col(idCol)), lit(1L), parts)
      .select(col(idCol), col("_cum_before").as("shuffle_rank"))
    docs.join(ranks, Seq(idCol))
  }

  /** Duplication-aware upsampling schedule (the "use each duplicate
    * cluster at most `capCopies` times" pre-training recipe): exact-dup
    * groups on normalized text, one row per group with its survivor
    * (min id), member count, the scheduled copy count
    * `min(n_members, capCopies)`, and the scheduled token mass
    * (group token count × copies) the sampler will draw. Rationale:
    * naive dedup throws away the duplication signal entirely, while
    * training on every copy over-weights boilerplate — bounded
    * upsampling keeps popularity as a bounded prior.
    *
    * Scale: identical shuffle shape to [[Dedup.exactDedup]] — one hash
    * aggregation whose key is xxhash64(norm_text) when `hashed` (the
    * production default; 8-byte keys, never document bodies). Token
    * count is whitespace-split on the already-collapsed normalization,
    * so it's a narrow map on the aggregated group row, not the corpus. */
  def dupAwareEpochs(docs: DataFrame, idCol: String, textCol: String,
                     capCopies: Int = 4, hashed: Boolean = true): DataFrame = {
    require(capCopies >= 1, s"capCopies must be >= 1, got $capCopies")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        TextAnalysis.normalizeForDedup(col(textCol)).as("norm_text"))
    val key = if (hashed) xxhash64(col("norm_text")) else col("norm_text")
    val copies = least(col("n_members"), lit(capCopies.toLong))
    base.groupBy(key.as("_k"))
      .agg(min(col(idCol)).as("survivor_id"),
        count(lit(1)).as("n_members"),
        min(col("norm_text")).as("norm_text"))
      .select(col("survivor_id"), col("n_members"), copies.as("n_copies"),
        (size(split(col("norm_text"), " ")).cast("bigint") * copies)
          .as("sched_tokens"))
  }

  /** Corpus mixture report + sampling weights: per `groupCols` stratum
    * (e.g. lang × source), document/token counts, the stratum's token
    * share, and the integer sampling weight that moves the mixture
    * toward UNIFORM across strata — `weight_e4 = target_share/share`
    * rendered in e4 fixed-point with floor division at every step, so a
    * SQL oracle reproduces the weights bitwise. Shares floor to 0 for
    * strata below 1/10000 of the corpus; the weight divisor floors at 1
    * so such strata get the maximum finite upweight rather than a
    * division by zero. Swap the uniform target for a broadcast target
    * table and this is general mixture reweighting (DoReMi-style
    * domain weights consume exactly this shape).
    *
    * Scale: one partial-aggregated groupBy over the corpus (map-side
    * collapse: strata ≪ rows), then a 1-row total broadcast-joined
    * back — the same lazy one-row-broadcast pattern as the unigram LM
    * (d25); nothing but the stratum table ever shuffles. */
  def mixtureWeights(docs: DataFrame, groupCols: Seq[String],
                     textCol: String): DataFrame = {
    val strata = docs.filter(col(textCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.ops.TextAnalysis.tokenCountWhitespace(col(textCol))
          .cast("bigint")).as("n_tokens"))
    val totals = strata.agg(sum(col("n_tokens")).as("_total"),
      count(lit(1)).as("_n_groups"))
    val share = call_function("div", col("n_tokens") * lit(10000L), col("_total"))
    val target = call_function("div", lit(10000L), col("_n_groups"))
    strata.crossJoin(broadcast(totals))
      .withColumn("share_e4", share)
      .withColumn("weight_e4", call_function("div",
        target * lit(10000L), greatest(col("share_e4"), lit(1L))))
      .select((groupCols.map(col) ++ Seq(col("n_docs"), col("n_tokens"),
        col("share_e4"), col("weight_e4"))): _*)
  }

  /** The two-phase distributed prefix sum shared by [[packSequences]]
    * and [[shuffleOrder]]: appends `_cum_before` = sum of `valueCol`
    * over all rows STRICTLY before this one in the global `orderCols`
    * ordering. A single-partition `Window.orderBy` cumsum would
    * serialize 10^12 rows through one task; instead:
    *  1. range-repartition by the order keys (partition p holds a key
    *     range below partition p+1's — RangePartitioner assigns
    *     ascending ranges to ascending partition ids);
    *  2. per-partition value totals — `parts` numbers, collected to the
    *     driver, scanned into per-partition global offsets (the one
    *     driver action, O(parts), same class as the IVF centroid pull);
    *  3. within-partition cumsum (window keyed by partition id —
    *     parallel across partitions) + the offset via broadcast join
    *     (not a when-chain: at cluster scale `parts` is thousands and a
    *     case expression that wide breaks codegen).
    *
    * The `_pid` exchange before the window re-moves rows already
    * clustered by pid (Catalyst can't see the checkpoint's physical
    * distribution) — accepted: it shuffles only the narrow manifest
    * (id + two longs per DOCUMENT, not the corpus text). `orderCols`
    * must be a total order (no ties): the window's default RangeFrame
    * treats tied keys as peers and would include them in "before".
    * Both callers order by a unique id. */
  private def cumBefore(df: DataFrame, orderCols: Seq[Column],
                        valueCol: Column, parts: Int): DataFrame = {
    require(!df.columns.exists(Seq("_pid", "_off", "_v").contains),
      "cumBefore: input must not carry internal columns _pid/_off/_v")
    val ranged = df.withColumn("_v", valueCol)
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true) // pin rows to their measured partition:
      // the per-pid totals below and the window cumsum must see the
      // SAME row→pid mapping, and spark_partition_id is nondeterministic
      // (a recompute after a lost partition could re-range differently)
    val totals = ranged.groupBy("_pid").agg(sum("_v").as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L) {
      (acc, p) => acc + totals.getOrElse(p, 0L)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = (0 until parts).map(p => (p, offsets(p))).toDF("_pid", "_off")
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy(orderCols: _*)
    ranged.join(broadcast(offDf), Seq("_pid"))
      .withColumn("_cum_before",
        sum("_v").over(wp) - col("_v") + col("_off"))
      .drop("_pid", "_off", "_v")
  }
}
