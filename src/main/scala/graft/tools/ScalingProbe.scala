package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.route.RouteStage
import graft.run.Pipeline

/** Child-JVM scaling probe, launched by [[graft.Bench]] under
  * `taskset -c 0..N-1`: with the WHOLE JVM (worker, GC and compiler
  * threads) pinned to N CPUs, local[N] faithfully simulates an
  * N-core cluster node — unpinned, the small config borrows extra host
  * CPUs for GC/JIT and the efficiency ratio reads ~15% too low.
  *
  * Runs one warmup on a slice + one timed full pass of the pipeline
  * compute path; prints `PROBE_SEC <seconds>`.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val Array(coresS, turnsPath) = args.take(2)
    val cores = coresS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-probe-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(df: org.apache.spark.sql.DataFrame): Unit = {
      val enriched = Pipeline.parseEnrich(spark, df)
      RouteStage.tagsExploded(enriched, Pipeline.routeTable)
        .groupBy(col("route"), window(col("ts"), "1 hour"), col("role"))
        .agg(count(lit(1)).as("count"))
        .write.format("noop").mode("overwrite").save()
    }
    run(spark.read.parquet(turnsPath).limit(100000)) // JIT/codegen warmup
    val t0 = System.nanoTime()
    run(spark.read.parquet(turnsPath))
    println(s"PROBE_SEC ${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
