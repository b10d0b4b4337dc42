package graft.run

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.route.RouteStage
import graft.synth.TranscriptSynth

/** Physical-plan quality gates (SURVEY.md §4): pushdown, pruning, codegen
  * and shuffle-count properties the 100 TB design relies on. */
class PlanSpec extends SparkSpec {

  private lazy val turnsDir = {
    val dir = Files.createTempDirectory("graft_plan_turns").toString
    TranscriptSynth.generate(spark, TranscriptSynth.Config(2000, 10))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("filters and projection push into the parquet scan") {
    val q = spark.read.parquet(turnsDir)
      .filter(col("role") === "user" && col("turn_idx") > 5)
      .select("conv_id", "turn_idx")
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("IsNotNull(role)") || scanLine.contains("EqualTo(role,user)"),
      s"role filter not pushed: $scanLine")
    assert(scanLine.contains("GreaterThan(turn_idx,5)"), s"turn_idx filter not pushed: $scanLine")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), s"unused text column read: $readSchema")
  }

  test("parse→enrich→route-tag→window-count plans exactly ONE shuffle") {
    val enriched = Pipeline.parseEnrich(spark, spark.read.parquet(turnsDir))
    val out = RouteStage.tagsExploded(enriched, Pipeline.routeTable)
      .groupBy(col("route"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)))
    val plan = out.queryExecution.executedPlan.toString
    // BroadcastExchange (the enrich dim) is expected and is not a shuffle
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected exactly one shuffle (the final agg), got $shuffles:\n$plan")
  }

  test("the parse expression runs inside whole-stage codegen") {
    val parsed = graft.parse.ParseStage(
      spark.read.parquet(turnsDir), Pipeline.parseConfig)
    val plan = parsed.queryExecution.executedPlan.toString
    // the projection carrying multi_pattern_extract must be inside a
    // WholeStageCodegen region (lines inside are prefixed *(n))
    val line = plan.linesIterator.find(_.contains("multi_pattern_extract")).getOrElse("")
    assert(line.contains("*("), s"parse projection fell out of codegen: $line")
  }

  test("the parse bank evaluates ONCE per row in count-over-parsed plans") {
    // round 2: Catalyst inlined the parse projection into both the
    // required-attr isNotNull filter and the groupBy keys → 2 evals of
    // the most expensive expression in the engine. The Generate barrier
    // in ParseStage.apply pins it to one.
    val parsed = graft.parse.ParseStage(
      spark.read.parquet(turnsDir), Pipeline.parseConfig)
    val p12ish = graft.agg.CountStage.count(
      parsed,
      graft.model.PipelineConfig.MetricSpec("n",
        attrs = Seq(graft.model.PipelineConfig.AttrSpec("component"),
          graft.model.PipelineConfig.AttrSpec("level", Some("none")))),
      Pipeline.resolveAttr(Pipeline.parsedFields))
    val occurrences = "multi_pattern_extract".r
      .findAllIn(p12ish.queryExecution.optimizedPlan.toString).size
    assert(occurrences == 1, s"parse bank evaluated $occurrences times")
    // filter-then-project shape (p02-like) must also stay single-eval
    val p02ish = parsed.filter(col("pattern") === "status")
      .select(col("parsed").getItem("level").as("level"))
    val occ2 = "multi_pattern_extract".r
      .findAllIn(p02ish.queryExecution.optimizedPlan.toString).size
    assert(occ2 == 1, s"parse bank evaluated $occ2 times in filter shape")
  }

  test("flagship (unbarriered) parse still evaluates the bank exactly once") {
    // Pipeline.parseEnrich opts OUT of the Generate barrier for its ~10%
    // overhead (ParseStage scaladoc) — legal only while this gate holds:
    // the full flagship plan must contain exactly one bank evaluation
    val enriched = Pipeline.parseEnrich(spark, spark.read.parquet(turnsDir))
    val out = RouteStage.tagsExploded(enriched, Pipeline.routeTable)
      .groupBy(col("route"), window(col("ts"), "1 hour"), col("role"))
      .agg(count(lit(1)))
    val occ = "multi_pattern_extract".r
      .findAllIn(out.queryExecution.optimizedPlan.toString).size
    assert(occ == 1, s"flagship parse bank evaluated $occ times")
  }

  test("predicates on non-parsed columns still push through the parse Generate") {
    val parsed = graft.parse.ParseStage(
      spark.read.parquet(turnsDir), Pipeline.parseConfig)
    val q = parsed.filter(col("role") === "user").select("conv_id", "pattern")
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("EqualTo(role,user)") || scanLine.contains("IsNotNull(role)"),
      s"role filter not pushed through Generate: $scanLine")
  }

  test("count aggregation is partial (map-side combine before the shuffle)") {
    val q = spark.read.parquet(turnsDir).groupBy("role").agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial_")),
      s"no partial aggregate before shuffle:\n${aggLines.mkString("\n")}")
  }

  test("servicegraph full-outer TTL join keys on (conv_id, corr_id), no nested loop") {
    // the TTL range predicate must ride as a join FILTER on an
    // equality-keyed join — a planner that only saw the range would
    // fall back to BroadcastNestedLoopJoin, which is O(n²) at 10^12
    // turns; the equality keys keep it a single hash-partitioned
    // shuffle on (conv_id, corr_id)
    val tr = spark.read.parquet(turnsDir)
    val clients = tr.filter(col("tool") =!= "")
      .select(col("conv_id"), col("turn_idx").cast("bigint").as("corr_id"),
        col("role").as("client_service"), lit(false).as("client_failed"),
        col("ts").cast("timestamp").as("client_ts"))
    val servers = tr.filter(col("turn_idx") > 0)
      .select(col("conv_id"), (col("turn_idx") - 1).cast("bigint").as("corr_id"),
        col("role").as("server_service"), lit(false).as("server_failed"),
        col("ts").cast("timestamp").as("server_ts"))
    val plan = graft.streaming.StreamingPipeline
      .serviceGraph(clients, servers, "0 seconds", "5 minutes")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"servicegraph degenerated to a nested loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected an equality-keyed join:\n$plan")
  }
}
