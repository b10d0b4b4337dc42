package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the optimized + executed plan of registered SparkEntry queries
  * — the `.explain` loop the scale audit runs after every new operator
  * (same session config as the bench so plans match what's measured).
  *
  * Usage: `runMain graft.tools.PlanDump <queryName>...`
  * (`SPARK_GRAFT_SF_DIR` selects the input; default sf0.001 — plan
  * SHAPE is scale-invariant, only AQE runtime re-plans differ).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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
