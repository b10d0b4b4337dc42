package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.route.RouteStage
import graft.run.Pipeline

/** Throwaway calibration main (not part of the library surface). */
object Calibrate {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val cores = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 1
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (r <- 1 to reps) {
      what match {
        case "skew" => // hot-conv rollup: plain groupBy vs salted two-phase
          // fixture dir is keyed by the generator knobs: a stale
          // /tmp cache from a run with different (nTurns, nConvs,
          // hotPct) must not be silently reused as this configuration
          val (nT, nC, hot) = (8000000L, 40000L, 40)
          val skewPath = s"/tmp/graft_bench/turns_skew_${nT}_${nC}_h$hot"
          if (!java.nio.file.Files.exists(java.nio.file.Paths.get(skewPath, "_SUCCESS"))) {
            graft.synth.TranscriptSynth.generate(s,
              graft.synth.TranscriptSynth.Config(nT, nC, hotPct = hot))
              .write.mode("overwrite").parquet(skewPath)
          }
          val turns = s.read.parquet(skewPath)
          val plainSec = time(noop(graft.agg.Rollup.rollup(turns)))
          // DEFAULT blockSize (the shipped configuration) — the old
          // positional `32` predated the saltBuckets→blockSize
          // signature change and measured 32-turn blocks (256× below
          // design), a configuration production never runs
          val saltedSec = time(noop(graft.agg.Rollup.rollupSalted(turns)))
          println(s"CALIB skew cores=$cores rep=$r plain=$plainSec salted=$saltedSec")
        case "readonly" =>
          val sec = time {
            noop(s.read.parquet("/tmp/graft_bench/turns_20000000"))
          }
          println(s"CALIB readonly cores=$cores rep=$r sec=$sec")
        case "parseonly" =>
          val sec = time {
            noop(graft.parse.ParseStage(
              s.read.parquet("/tmp/graft_bench/turns_20000000"), Pipeline.parseConfig))
          }
          println(s"CALIB parseonly cores=$cores rep=$r sec=$sec thr=${(20000000/sec).round}")
        case "compute" => // parse→enrich→route-tag→windowed agg, no sink IO
          val sec = time {
            val turns = s.read.parquet("/tmp/graft_bench/turns_20000000")
            val enriched = Pipeline.parseEnrich(s, turns)
            val exploded = RouteStage.tagsExploded(enriched, Pipeline.routeTable)
            noop(exploded.groupBy(col("route"), window(col("ts"), "1 hour"), col("role"))
              .agg(count(lit(1))))
          }
          println(s"CALIB compute cores=$cores rep=$r sec=$sec thr=${(20000000/sec).round}")
        case "pipeline" =>
          val sec = time {
            val turns = s.read.parquet("/tmp/graft_bench/turns_20000000")
            val enriched = Pipeline.parseEnrich(s, turns)
            RouteStage.writeMultiMatch(enriched, Pipeline.routeTable, s"/tmp/graft_calib/sinks_$cores")
            noop(s.read.parquet(s"/tmp/graft_calib/sinks_$cores")
              .groupBy(col("route"), window(col("ts"), "1 hour"), col("role"))
              .agg(count(lit(1))))
          }
          println(s"CALIB pipeline cores=$cores rep=$r sec=$sec thr=${(20000000/sec).round}")
        case q =>
          val sec = time(noop(graft.SparkEntry.queries(q)(s, "/root/testdata/sf0.1")))
          println(s"CALIB $q rep=$r sec=$sec")
      }
    }
    s.stop()
  }
}
