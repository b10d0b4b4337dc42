package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PipelineConfig._
import graft.parse.ParseStage
import graft.route.RouteStage
import graft.run.Pipeline

/** A/B harness for the round-3 parse Generate barrier: measures the
  * flagship compute path and a p12-shaped count-over-parsed query with
  * (A) the barriered `ParseStage.apply` (one bank evaluation per row)
  * vs (B) the round-2 plain projection (Catalyst inlines the bank into
  * downstream filters/grouping keys → up to 2 evaluations per row).
  * Alternating reps in one JVM so both sides share the same ambient
  * window. Usage: runMain graft.tools.ParseAB <turnsParquet> [cores] [reps]
  */
object ParseAB {

  /** Round-2 rendering: plain projection, no barrier — THE production
    * `barrier=false` path, not a copy of it: the A/B must measure
    * exactly the shape the engine ships, or a ParseStage change makes
    * the harness silently measure something else. */
  private def parsePlain(df: DataFrame, config: ParseConfig): DataFrame =
    ParseStage(df, config, barrier = false)

  private def exhaust(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_bench/turns_8000000")
    val cores = args.lift(1).map(_.toInt).getOrElse(16)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turns = spark.read.parquet(path)

    def flagship(parsed: DataFrame): DataFrame = {
      val enriched = graft.enrich.EnrichStage(
        parsed, graft.enrich.EnrichStage.dimTool(spark), Seq("tool"))
      RouteStage.tagsExploded(enriched, Pipeline.routeTable)
        .groupBy(col("route"), window(col("ts"), "1 hour"), col("role"))
        .agg(count(lit(1)).as("count"))
    }
    def p12ish(parsed: DataFrame): DataFrame =
      graft.agg.CountStage.count(parsed,
        MetricSpec("n", attrs = Seq(AttrSpec("component"), AttrSpec("level", Some("none")))),
        Pipeline.resolveAttr(Pipeline.parsedFields))

    val jobs = Seq(
      ("flagship_barrier", () => flagship(ParseStage(turns, Pipeline.parseConfig))),
      ("flagship_plain", () => flagship(parsePlain(turns, Pipeline.parseConfig))),
      ("p12_barrier", () => p12ish(ParseStage(turns, Pipeline.parseConfig))),
      ("p12_plain", () => p12ish(parsePlain(turns, Pipeline.parseConfig))))
    // warmup both shapes once
    jobs.foreach { case (_, mk) => exhaust(mk().limit(10000)) }
    val acc = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to reps; (name, mk) <- jobs)
      acc(name) = time(exhaust(mk())) :: acc(name)
    jobs.foreach { case (name, _) =>
      val xs = acc(name)
      println(f"AB $name%-18s min=${xs.min}%.3f reps=${xs.reverse.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
