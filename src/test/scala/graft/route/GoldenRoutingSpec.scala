package graft.route

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential golden test against the reference's OWN routing-connector
  * test (`/root/reference/connector/routingconnector/logs_test.go:78-232`,
  * TestLogsAreCorrectlySplitPerResourceAttributeWithOTTL): the exact
  * routing table —
  *   route0: IsMatch(X-Tenant, ".*acme")        → pipeline logs0
  *   route1: IsMatch(X-Tenant, "_acme")         → pipeline logs1
  *   route2: X-Tenant == "ecorp"                → pipelines default+logs0
  *   default pipeline: logsDefault
  * — and each of the five sub-cases' expected sink contents. OTTL
  * IsMatch is regex containment (rlike).
  */
class GoldenRoutingSpec extends SparkSpec {
  import spark.implicits._

  private def routesFor(df: DataFrame) = Seq(
    (col("tenant").rlike(".*acme"), Seq("logs0")),
    (col("tenant").rlike("_acme"), Seq("logs1")),
    (col("tenant") === "ecorp", Seq("default", "logs0")))

  private def sinks(rows: Seq[String]): Map[String, Set[String]] = {
    val df = rows.toDF("tenant")
    RouteStage.fanOutPipelines(df, routesFor(df), Seq("default"))
      .map { case (p, f) => p -> f.as[String].collect().toSet }
      .filter(_._2.nonEmpty)
  }

  test("logs matched by no expressions → default only") {
    assert(sinks(Seq("something-else")) == Map("default" -> Set("something-else")))
  }

  test("logs matched one expression → that pipeline only") {
    assert(sinks(Seq("xacme")) == Map("logs0" -> Set("xacme")))
  }

  test("logs matched by two expressions → both pipelines, same payloads") {
    // '_acme' and 'x_acme' both match ".*acme" AND "_acme" (containment)
    val out = sinks(Seq("x_acme", "_acme"))
    assert(out == Map(
      "logs0" -> Set("x_acme", "_acme"),
      "logs1" -> Set("x_acme", "_acme")))
  }

  test("one matched by multiple expressions, other matched none") {
    val out = sinks(Seq("_acme", "something-else"))
    assert(out == Map(
      "logs0" -> Set("_acme"),
      "logs1" -> Set("_acme"),
      "default" -> Set("something-else")))
  }

  test("one expression routed to multiple pipelines → delivered once to each") {
    val out = sinks(Seq("ecorp"))
    assert(out == Map(
      "default" -> Set("ecorp"),
      "logs0" -> Set("ecorp")))
  }

  // ---- match_once variant (logs_test.go:233-384) ----

  private def sinksOnce(rows: Seq[String]): Map[String, Set[String]] = {
    val df = rows.toDF("tenant")
    RouteStage.matchOncePipelines(df, routesFor(df), Seq("default"))
      .map { case (p, f) => p -> f.as[String].collect().toSet }
      .filter(_._2.nonEmpty)
  }

  test("match_once: multi-expression match goes only to the FIRST route's pipeline") {
    // '_acme' matches routes 0 and 1; match_once → logs0 only
    assert(sinksOnce(Seq("x_acme", "_acme")) == Map("logs0" -> Set("x_acme", "_acme")))
  }

  test("match_once: matched-or-default split") {
    assert(sinksOnce(Seq("_acme", "something-else")) == Map(
      "logs0" -> Set("_acme"),
      "default" -> Set("something-else")))
  }

  test("match_once: first matching route still fans to ALL its pipelines") {
    assert(sinksOnce(Seq("ecorp")) == Map(
      "default" -> Set("ecorp"),
      "logs0" -> Set("ecorp")))
  }
}
