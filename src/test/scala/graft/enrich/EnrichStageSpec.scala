package graft.enrich

import graft.SparkSpec
import graft.model.PipelineConfig.EnrichAction

class EnrichStageSpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    ("bash", "preset"),          // key matched, fact value present
    ("search", null),            // key matched, fact value null
    ("unknown", "keep")          // key unmatched
  ).toDF("tool", "cost_class")

  private def dim = Seq(
    ("bash", "high"), ("search", "low")
  ).toDF("tool", "cost_class")

  private def get(action: EnrichAction): Map[String, String] =
    EnrichStage(fact, dim, Seq("tool"), action)
      .select("tool", "cost_class").as[(String, String)].collect().toMap

  test("upsert: dim value wins when matched (attraction.go UPSERT)") {
    assert(get(EnrichAction.Upsert) ==
      Map("bash" -> "high", "search" -> "low", "unknown" -> "keep"))
  }

  test("insert: only fills nulls (attraction.go INSERT)") {
    assert(get(EnrichAction.Insert) ==
      Map("bash" -> "preset", "search" -> "low", "unknown" -> "keep"))
  }

  test("update: only replaces non-nulls (attraction.go UPDATE)") {
    assert(get(EnrichAction.Update) ==
      Map("bash" -> "high", "search" -> null, "unknown" -> "keep"))
  }

  test("new columns from dim are simply attached (null when unmatched)") {
    val d2 = Seq(("bash", "shell")).toDF("tool", "family")
    val out = EnrichStage(fact, d2, Seq("tool"))
      .select("tool", "family").as[(String, String)].collect().toMap
    assert(out == Map("bash" -> "shell", "search" -> null, "unknown" -> null))
  }

  test("enrich plans as a broadcast hash join (no fact-side shuffle)") {
    val plan = EnrichStage(fact, dim, Seq("tool")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

}
