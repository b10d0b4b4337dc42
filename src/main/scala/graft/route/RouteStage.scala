package graft.route

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{filter => arrayFilter}

import graft.model.PipelineConfig.RouteTable

/** Route stage — the routing-connector fan-out re-expressed relationally
  * (SURVEY.md §2.4, §3.3).
  *
  * Reference semantics (`connector/routingconnector/logs.go:62-103` in
  * `/root/reference`):
  *   - multi-match fan-out by default (one row may reach several sinks);
  *   - `match_once=true` → first-match-wins (`logs.go:87`);
  *   - rows matching no route → default sink (`logs.go:94-97`);
  *   - `error_mode=ignore` → a predicate that errors counts as no-match
  *     (we compile predicates null-safe, so nulls fall to default).
  *
  * Physical strategy at 100 TB:
  *   - `matchOnce`: ONE pass — tag each row with a `route` column via a
  *     short-circuiting CASE chain, then a single write with
  *     `partitionBy("route")`. No per-sink rescan.
  *   - multi-match: one filtered write per sink from a cached upstream —
  *     each sink's predicate is pushed into its own scan; with the
  *     upstream persisted, the source is read once.
  */
object RouteStage {

  /** First-match route tag (`when` chains short-circuit exactly like the
    * reference's `break` at `transformer/router/transformer.go:59`).
    * Null predicate results (error_mode=ignore) fall through to default. */
  def routeTag(table: RouteTable): Column = {
    val tagged = table.routes.foldLeft(Option.empty[Column]) { (acc, r) =>
      Some(acc match {
        case None      => when(coalesce(r.predicate, lit(false)), lit(r.name))
        case Some(c)   => c.when(coalesce(r.predicate, lit(false)), lit(r.name))
      })
    }
    tagged.map(_.otherwise(lit(table.defaultName))).getOrElse(lit(table.defaultName)).as("route")
  }

  /** Tag rows with their (first-match) route — the match_once plan. */
  def tagged(df: DataFrame, table: RouteTable): DataFrame =
    df.withColumn("route", routeTag(table))

  /** Multi-match fan-out: route name → filtered frame, plus the default
    * sink as the conjunction of negations (null-safe). */
  def fanOut(df: DataFrame, table: RouteTable): Map[String, DataFrame] = {
    val sinks = table.routes.map(r => r.name -> df.filter(coalesce(r.predicate, lit(false)))).toMap
    val noMatch = table.routes
      .map(r => !coalesce(r.predicate, lit(false)))
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    sinks + (table.defaultName -> df.filter(noMatch))
  }

  /** Single-pass partitioned write for the match_once plan: the
    * `df.write.partitionBy("route")` path — one scan, one shuffle-free
    * write, route directories as sink tables. */
  def writeMatchOnce(df: DataFrame, table: RouteTable, outDir: String,
                     format: String = "parquet"): Unit =
    tagged(df, table).write.format(format).mode("overwrite")
      .partitionBy("route").save(outDir)

  /** Array of ALL matching route names per row (empty → default) — the
    * multi-match verdict as data. */
  def routesArray(table: RouteTable): Column = {
    val hits = arrayFilter(
      array(table.routes.map(r =>
        when(coalesce(r.predicate, lit(false)), lit(r.name))): _*),
      x => x.isNotNull)
    when(size(hits) === 0, array(lit(table.defaultName))).otherwise(hits).as("routes")
  }

  /** Single-pass MULTI-MATCH fan-out: explode the matched-routes array
    * and write once with `partitionBy("route")` — each row lands in every
    * sink it matches, the source is scanned and parsed exactly ONCE
    * (vs. one filtered scan per sink in [[fanOut]]). The scale plan for
    * the routing-connector's default multi-match mode: at 10^12 turns,
    * k predicate-filtered rescans are k× the IO; this is 1×(1+dup_rate).
    */
  def tagsExploded(df: DataFrame, table: RouteTable): DataFrame =
    df.withColumn("route", explode(routesArray(table)))

  def writeMultiMatch(df: DataFrame, table: RouteTable, outDir: String,
                      format: String = "parquet"): Unit =
    tagsExploded(df, table).write.format(format).mode("overwrite")
      .partitionBy("route").save(outDir)

  /** Per-sink frames + the single-scan tagged stream, honoring the
    * table's match semantics in ONE place (match_once → first-match
    * single tag, `routingconnector/logs.go:87`; default → multi-match
    * explosion). Both materialized run paths (Pipeline.run and the
    * config surface's Compiled.run) route through here: they previously
    * each hard-coded the multi-match pair, so a `match_once: true`
    * config silently got fan-out duplicates in every matching sink and
    * doubled every per-route count. Counts derived from the returned
    * stream agree with the sinks by construction. */
  def sinksAndStream(df: DataFrame, table: RouteTable)
      : (Map[String, DataFrame], DataFrame) =
    if (table.matchOnce) {
      val t = tagged(df, table)
      val names = table.routes.map(_.name) :+ table.defaultName
      (names.map(n => n -> t.filter(col("route") === n).drop("route")).toMap, t)
    } else (fanOut(df, table), tagsExploded(df, table))

  /** Route-to-multiple-pipelines fan-out (`connector/routingconnector/
    * config.go:70-82` Pipelines lists; delivery grouped per consumer so a
    * row reaching one pipeline via several routes arrives ONCE,
    * `logs.go:99-102`). Relational rendering: pipeline p's predicate =
    * OR of its routes' predicates (∨ default-membership when no route
    * matches) — single pass, once-delivery by construction. */
  def fanOutPipelines(df: DataFrame,
                      routes: Seq[(Column, Seq[String])],
                      defaultPipelines: Seq[String]): Map[String, DataFrame] = {
    val safe = routes.map { case (p, ps) => (coalesce(p, lit(false)), ps) }
    val noMatch = safe.map(r => !r._1).reduceOption(_ && _).getOrElse(lit(true))
    val pipelines = (routes.flatMap(_._2) ++ defaultPipelines).distinct
    pipelines.map { p =>
      val viaRoutes = safe.collect { case (pred, ps) if ps.contains(p) => pred }
      val viaDefault = if (defaultPipelines.contains(p)) Seq(noMatch) else Nil
      val predicate = (viaRoutes ++ viaDefault).reduce(_ || _)
      p -> df.filter(predicate)
    }.toMap
  }

  /** match_once with multi-pipeline routes (`logs.go:87` first-match break
    * + per-route Pipelines list): the FIRST matching route's pipelines all
    * receive the row; later matches are ignored. Rendered as a first-match
    * route index tag + per-pipeline membership filter. */
  def matchOncePipelines(df: DataFrame,
                         routes: Seq[(Column, Seq[String])],
                         defaultPipelines: Seq[String]): Map[String, DataFrame] = {
    val safe = routes.map { case (p, ps) => (coalesce(p, lit(false)), ps) }
    val idx = safe.zipWithIndex.foldRight(lit(-1): Column) { case (((pred, _), i), rest) =>
      when(pred, lit(i)).otherwise(rest)
    } // when-chains evaluate FIRST match (short-circuit CASE)
    val taggedDf = df.withColumn("_route_idx", idx)
    val pipelines = (routes.flatMap(_._2) ++ defaultPipelines).distinct
    pipelines.map { p =>
      val idxs = safe.zipWithIndex.collect { case ((_, ps), i) if ps.contains(p) => i }
      val viaRoutes = if (idxs.isEmpty) lit(false) else col("_route_idx").isin(idxs: _*)
      val viaDefault = if (defaultPipelines.contains(p)) col("_route_idx") === -1 else lit(false)
      p -> taggedDf.filter(viaRoutes || viaDefault).drop("_route_idx")
    }.toMap
  }
}
