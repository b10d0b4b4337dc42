package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` output for registered SparkEntry
  * queries — the round-6 plan-evidence dumper (plans/r06 txt files).
  * Same session shape as the bench (AQE on, 8 MB splits, shuffle
  * partitions = cores) so Exchange counts and join strategies match
  * what the bench measures.
  *
  * Usage: `runMain graft.tools.PlanFormatted <outDir> <suffix> <queryName>...`
  * writes `<outDir>/<name>_<suffix>.txt` per query.
  * (`SPARK_GRAFT_SF_DIR` selects the input; default sf0.01,
  * `SPARK_GRAFT_CPUS` the parallelism; default 8.)
  */
object PlanFormatted {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanFormatted <outDir> <suffix> <queryName>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    names.foreach(name => require(graft.SparkEntry.queries.contains(name),
      s"unknown query '$name'"))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-planformatted")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[pf] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
