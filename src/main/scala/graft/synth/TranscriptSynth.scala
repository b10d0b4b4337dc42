package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, seeded transcript synthesiser — the `generate` input
  * analog (`pkg/stanza/operator/input/generate/input.go:28-60` in
  * `/root/reference`), parameterised per FIXTURES.md §1.
  *
  * Built on `spark.range(n)` + hash mixing: fully distributed (no driver
  * materialisation), identical output for identical (seed, knobs) at any
  * parallelism — the property BENCH relies on when comparing local[8] vs
  * local[32] runs.
  *
  * Skew profile: `hotPct` percent of all turns land in conversation 0 —
  * the "hot conversation" the north rule's salted repartitioning must
  * handle. The remaining turns spread uniformly over `nConvs`.
  */
object TranscriptSynth {

  final case class Config(
      nTurns: Long,
      nConvs: Long,
      seed: Long = 42L,
      hotPct: Int = 0, // 0..99: % of turns assigned to conv 0
      baseEpochSec: Long = 1704067200L // 2024-01-01T00:00:00Z
  )

  /** Raw turn rows; turn_idx dense per conversation via one row_number
    * shuffle (synth-only cost, not pipeline cost). */
  def generate(spark: SparkSession, cfg: Config): DataFrame = {
    // fail fast: pmod(_, 0) is null (or DIVIDE_BY_ZERO under ANSI), so
    // nConvs=0 would silently emit null conv_ids into a column the Turn
    // schema declares non-nullable
    require(cfg.nConvs > 0, s"nConvs must be positive, got ${cfg.nConvs}")
    require(cfg.nTurns >= 0, s"nTurns must be non-negative, got ${cfg.nTurns}")
    require(cfg.hotPct >= 0 && cfg.hotPct <= 100,
      s"hotPct must be in [0,100], got ${cfg.hotPct}")
    val h = xxhash64(col("id"), lit(cfg.seed))
    val hotCut = lit(cfg.hotPct.toLong)
    val convNum = when(pmod(h, lit(100L)) < hotCut, lit(0L))
      .otherwise(pmod(xxhash64(col("id"), lit(cfg.seed + 1)), lit(cfg.nConvs)))
    val roleNum = pmod(xxhash64(col("id"), lit(cfg.seed + 2)), lit(10L))
    val noise = pmod(xxhash64(col("id"), lit(cfg.seed + 3)), lit(11L))
    val k = pmod(xxhash64(col("id"), lit(cfg.seed + 4)), lit(100L))
    val cents = pmod(xxhash64(col("id"), lit(cfg.seed + 5)), lit(100000L))

    val base = spark.range(cfg.nTurns)
      .withColumn("conv_num", convNum)
      .withColumn("role_num", roleNum)
      .withColumn("k", k)
      .withColumn("cents", cents)
      .withColumn("noise", noise)

    // role mix: 4 user, 3 assistant, 2 tool, 1 system (of 10)
    val role = when(col("role_num") < 4, "user")
      .when(col("role_num") < 7, "assistant")
      .when(col("role_num") < 9, "tool")
      .otherwise("system")
    val tool = when(col("role_num") === 7, "bash")
      .when(col("role_num") === 8, "search")
      .otherwise("")
    val level = when(col("k") % 7 === 0, "ERROR")
      .when(col("k") % 3 === 0, "WARN").otherwise("INFO")
    val text = when(col("role_num").isin(7L, 8L),
        concat(lit("CALL tool="), tool, lit(" args={\"k\": "), col("k"),
               lit("} dur_ms="), col("cents")))
      .when(col("role_num") < 4 && col("noise") === 0,
        concat(lit("~~ noise "), col("id"), lit(" ~~")))
      .when(col("role_num") < 4,
        concat(lit("user="), col("conv_num"), lit(" action=msg cents="), col("cents")))
      .otherwise(
        concat(level, lit(" [comp-"), col("k") % 5, lit("] turn user="), col("conv_num")))

    val w = Window.partitionBy(col("conv_num")).orderBy(col("id"))
    base
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(
        concat(lit("conv-"), lpad(col("conv_num").cast("string"), 8, "0")).as("conv_id"),
        col("turn_idx"),
        role.as("role"),
        text.as("text"),
        tool.as("tool"),
        // widen BEFORE the multiply: int turn_idx * 7 overflows at
        // ~306M turns in one hot conversation (ANSI: job dies; non-ANSI:
        // negative epochs break the monotonic-ts determinism)
        timestamp_seconds(lit(cfg.baseEpochSec) + pmod(col("conv_num"), lit(86400L))
          + col("turn_idx").cast("bigint") * 7).as("ts"))
  }
}
