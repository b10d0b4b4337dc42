package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the optimized + executed plan of registered SparkEntry queries
  * — the `.explain` loop the scale audit runs after every new operator.
  * The session mirrors the bench's SQL config (AQE on, 8 MB file
  * splits, shuffle partitions = cores) at reduced parallelism, so plan
  * SHAPE matches what the bench measures; partition counts and AQE
  * runtime re-plans still scale with cores and input size.
  *
  * Usage: `runMain graft.tools.PlanDump <queryName>...`
  * (`SPARK_GRAFT_SF_DIR` selects the input; default sf0.001,
  * `SPARK_GRAFT_CPUS` the parallelism; default 4).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName>...")
    args.foreach(name => require(graft.SparkEntry.queries.contains(name),
      s"unknown query '$name' — known: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name: optimized ====")
      println(df.queryExecution.optimizedPlan.toString)
      println(s"==== $name: physical ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
